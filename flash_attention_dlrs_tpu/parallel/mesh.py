"""Device mesh construction + multi-host initialization.

TPU-native replacement for a distributed communication backend — the
reference has none (its only NCCL is an unused transitive wheel,
reference: requirements.txt:25; SURVEY.md §2.2): here scale-out is a
``jax.sharding.Mesh`` whose collectives ride ICI/DCN, with
``jax.distributed.initialize`` for multi-host process groups.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up (idempotent).  On single-host this is a no-op;
    on a pod slice it wires the jax.distributed process group over DCN.
    Arguments default from the standard JAX_* environment variables."""
    if jax.process_count() > 1:
        return  # already initialized
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr is None and num_processes is None:
        return  # single-host
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(
    axis_sizes: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data", "model"),
    *,
    devices=None,
) -> Mesh:
    """Build a named mesh over the available devices.

    With no ``axis_sizes``, all devices land on the FIRST axis (the rest get
    size 1) — the safe default for both 1-chip and N-chip runs.  Axis order
    convention: the innermost (last) axis maps to the fastest ICI links, so
    put tensor/context-parallel axes last and data-parallel first (DCN-ish).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = [n] + [1] * (len(axis_names) - 1)
    axis_sizes = list(axis_sizes)
    if int(np.prod(axis_sizes)) != n:
        raise ValueError(
            f"mesh {axis_sizes} needs {int(np.prod(axis_sizes))} devices, have {n}"
        )
    arr = np.array(devices).reshape(axis_sizes)
    return Mesh(arr, axis_names=tuple(axis_names))


def local_mesh_1d(axis_name: str = "x", max_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if max_devices:
        devs = devs[:max_devices]
    return Mesh(np.array(devs), axis_names=(axis_name,))
