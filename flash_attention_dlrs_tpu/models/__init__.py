from .optim import adamw8bit
from .transformer import (
    ModelConfig,
    forward,
    init_params,
    loss_fn,
    quantize_params,
)
from .train import make_train_state, make_train_step, param_shardings

__all__ = [
    "ModelConfig",
    "adamw8bit",
    "init_params",
    "forward",
    "loss_fn",
    "quantize_params",
    "make_train_state",
    "make_train_step",
    "param_shardings",
]
