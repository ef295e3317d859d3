from .convert import (
    config_from_hf,
    config_from_hf_gemma,
    import_hf_gemma,
    import_hf_llama,
    import_hf_phi3,
)
from .optim import adamw8bit
from .transformer import (
    ModelConfig,
    forward,
    init_params,
    loss_fn,
    quantize_params,
    unembed_matrix,
)
from .train import make_train_state, make_train_step, param_shardings
from .trainer import (
    TrainSpec,
    fit,
    lr_schedule,
    make_accum_train_step,
    make_optimizer,
)

__all__ = [
    "ModelConfig",
    "adamw8bit",
    "config_from_hf",
    "config_from_hf_gemma",
    "import_hf_gemma",
    "import_hf_llama",
    "import_hf_phi3",
    "init_params",
    "forward",
    "loss_fn",
    "quantize_params",
    "unembed_matrix",
    "make_train_state",
    "make_train_step",
    "TrainSpec",
    "fit",
    "lr_schedule",
    "make_accum_train_step",
    "make_optimizer",
    "param_shardings",
]
