"""Multi-host runtime initialization + ICI/DCN-aware mesh construction.

The TPU-native replacement for BOTH of the reference's process-management
layers (SURVEY.md §2.2): torch.distributed/NCCL setup in the pre-training
path (dust3r/training.py:93-155) and the shell-level one-scene-per-GPU
scheduler (scripts/run_eval.sh:42-50). Here a single SPMD program spans
all hosts: `initialize_runtime()` wires jax.distributed once per process,
and the mesh helpers lay axes out so the fast-changing axis rides ICI
(within a slice) and only the slow axis crosses DCN (between slices) —
the placement rule XLA's collectives assume.

Conventions:
- axis "data"  — batch / pair / scene parallelism (outermost; may span DCN)
- axis "rows"  — pixel-row sharding inside one render (must stay on ICI)
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

_INITIALIZED = False


def initialize_runtime(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed across hosts; no-op when single-process.

    Safe to call unconditionally from every entry point (each pipeline
    stage runs as its own process). Returns True when a multi-process
    runtime was (or already had been) initialized. Arguments default to
    the standard env vars (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID); on TPU pods jax.distributed can also auto-discover
    all three, so `initialize_runtime()` with no args is correct there.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        # single-process run (the common case in this environment)
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _INITIALIZED = True
    return True


def make_mesh_nd(
    axis_shape: Sequence[int],
    axis_names: Sequence[str],
    devices: Optional[Sequence] = None,
) -> Mesh:
    """N-D mesh with ICI/DCN-aware device placement.

    The LAST axis varies fastest over the raw device order, so put the
    axis with the heaviest collectives last (e.g. ("data", "rows")):
    neighboring positions along it map to ICI-adjacent chips. When the
    product spans multiple slices/hosts, `mesh_utils.create_device_mesh`
    keeps each DCN boundary aligned to the outermost axis.
    """
    devs = list(devices) if devices is not None else jax.devices()
    total = int(np.prod(axis_shape))
    if total > len(devs):
        raise ValueError(
            f"mesh {tuple(axis_shape)} needs {total} devices, "
            f"have {len(devs)}")
    devs = devs[:total]
    try:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_device_mesh(
            tuple(axis_shape), devices=devs)
    except Exception:
        # CPU test meshes / exotic topologies: plain row-major reshape
        arr = np.asarray(devs).reshape(tuple(axis_shape))
    return Mesh(arr, tuple(axis_names))


def make_hybrid_mesh(
    ici_shape: Sequence[int],
    dcn_shape: Sequence[int],
    axis_names: Sequence[str],
) -> Mesh:
    """Mesh over multiple pod slices: `dcn_shape` axes cross slices (DCN),
    `ici_shape` axes stay within a slice (ICI). Shapes pair positionally
    with `axis_names`; an axis that should not cross DCN uses dcn dim 1.

    Example — 2 slices of 16 chips, data-parallel across slices and
    row-sharded within: make_hybrid_mesh((1, 16), (2, 1), ("data", "rows")).
    """
    from jax.experimental import mesh_utils

    arr = mesh_utils.create_hybrid_device_mesh(
        tuple(ici_shape), tuple(dcn_shape))
    return Mesh(arr, tuple(axis_names))
