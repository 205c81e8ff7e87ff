"""Multi-host initialization and mesh construction.

The reference has no distributed story at all (SURVEY.md §2); this is the
multi-slice entry point for the BAL-scale configuration: initialize
``jax.distributed`` across hosts, build a mesh over every global device, and
keep the observation-axis collectives on ICI (intra-slice) while DCN only
carries the (tiny) replicated trust-region scalars implicitly.

On a single host this degrades to the local mesh — callers can use it
unconditionally.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
from jax.sharding import Mesh

from tpu3drecon.parallel.mesh import OBS_AXIS


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed if a multi-host environment is detected.

    Arguments default from the standard env vars (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID, or their COORDINATOR_* variants);
    single-host runs are a no-op.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS", os.environ.get("COORDINATOR_ADDRESS")
    )
    if coordinator_address is None:
        return  # single host
    num_processes = num_processes or int(
        os.environ.get("JAX_NUM_PROCESSES", os.environ.get("NUM_PROCESSES", "1"))
    )
    process_id = (
        process_id
        if process_id is not None
        else int(os.environ.get("JAX_PROCESS_ID", os.environ.get("PROCESS_ID", "0")))
    )
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_obs_mesh(axis_name: str = OBS_AXIS) -> Mesh:
    """1-D mesh over every global device (all hosts).

    For BA the observation axis is the only large reducible axis, and a flat
    mesh keeps each psum a single all-reduce that XLA routes over ICI within
    a slice and DCN across slices.  The reduced quantities (C*64 + P*9
    floats of U/V blocks per linearization) are small relative to per-device
    compute, so DCN bandwidth is not the bottleneck at BAL scale.
    """
    import numpy as np

    return Mesh(np.asarray(jax.devices()), (axis_name,))


def process_local_obs_slice(n_obs: int) -> slice:
    """The observation rows this process should load (host-sharded input
    pipelines: each host reads only its slice of a huge BAL problem)."""
    n_proc = jax.process_count()
    pid = jax.process_index()
    per = n_obs // n_proc
    start = pid * per
    end = n_obs if pid == n_proc - 1 else start + per
    return slice(start, end)
