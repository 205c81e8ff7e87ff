"""Solver-state checkpoint/resume via orbax.

The reference only checkpoints at benchmark granularity (whole-run pickles,
reference: src/benchmark/benchmark.py:46-70, benchmark_impl_shared.py:12-33
— kept in tpu3drecon.benchmark.harness).  SURVEY.md §5 flags the gap: long
BAL-scale solves need mid-solve checkpoints.  This module saves/restores a
``BAState`` (or any pytree of arrays) with orbax, and provides a chunked
driver that runs a long solve as N short solves with a checkpoint after each
chunk — resumable after preemption.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np


def save_state(state, directory: str, step: int) -> str:
    """Checkpoint a pytree of arrays at ``directory/step_<step>``."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(directory, f"step_{step}"))
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)
    return path


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = [
        int(name.split("_", 1)[1])
        for name in os.listdir(directory)
        if name.startswith("step_") and name.split("_", 1)[1].isdigit()
    ]
    return max(steps) if steps else None


def restore_state(template, directory: str, step: Optional[int] = None):
    """Restore the pytree saved at ``step`` (default: latest)."""
    import orbax.checkpoint as ocp

    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
    path = os.path.abspath(os.path.join(directory, f"step_{step}"))
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, item=jax.device_get(template))
    return jax.tree_util.tree_map(np.asarray, restored)


def ba_solve_checkpointed(
    problem,
    config,
    checkpoint_dir: str,
    chunk_iters: int = 10,
    solver_fn=None,
) -> Tuple[object, object, object]:
    """Run BA as resumable chunks of ``chunk_iters`` outer iterations.

    On restart with the same ``checkpoint_dir`` the solve continues from the
    last completed chunk (cameras/points restored; trust-region lambda
    restarts per chunk, which only costs a few extra accept/reject probes).
    """
    import dataclasses

    from tpu3drecon.solvers.bundle_adjust import ba_solve

    solver_fn = solver_fn or ba_solve
    total = config.maxiter
    chunk_config = config._replace(maxiter=chunk_iters)

    done = 0
    step0 = latest_step(checkpoint_dir)
    if step0 is not None:
        saved = restore_state(
            {
                "rmats": problem.cameras.rmats,
                "tvecs": problem.cameras.tvecs,
                "fx_fy": problem.cameras.fx_fy,
                "points3d": problem.points3d,
            },
            checkpoint_dir,
        )
        problem = dataclasses.replace(
            problem,
            cameras=dataclasses.replace(
                problem.cameras,
                rmats=jax.numpy.asarray(saved["rmats"]),
                tvecs=jax.numpy.asarray(saved["tvecs"]),
                fx_fy=jax.numpy.asarray(saved["fx_fy"]),
            ),
            points3d=jax.numpy.asarray(saved["points3d"]),
        )
        done = step0

    cams, pts, state = problem.cameras, problem.points3d, None
    while done < total:
        cams, pts, state = solver_fn(problem, chunk_config)
        done += chunk_iters
        save_state(
            {
                "rmats": cams.rmats,
                "tvecs": cams.tvecs,
                "fx_fy": cams.fx_fy,
                "points3d": pts,
            },
            checkpoint_dir,
            done,
        )
        import dataclasses as _dc

        problem = _dc.replace(
            problem,
            cameras=cams,
            points3d=pts,
        )
        if state is not None and bool(jax.device_get(state.converged)):
            break
    return cams, pts, state
