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
    """Restore the pytree saved at ``step`` (default: latest).

    ``template=None`` restores with the stored structure (a dict of numpy
    arrays) — required when saved leaves differ in shape from the live
    problem (permuted/padded engine layouts)."""
    import orbax.checkpoint as ocp

    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
    path = os.path.abspath(os.path.join(directory, f"step_{step}"))
    with ocp.PyTreeCheckpointer() as ckptr:
        if template is None:
            restored = ckptr.restore(path)
        else:
            restored = ckptr.restore(path, item=jax.device_get(template))
    return jax.tree_util.tree_map(np.asarray, restored)


def update_problem_solution(problem, cams, pts):
    """Re-inject a solver's (cameras, points) output into a packed problem.

    Solver outputs are in ORIGINAL order (engines un-permute before
    returning); packed layouts store points permuted+padded
    (``point_rows[packed] = original``, -1 = padding) and, for wtt hub/RCM
    relabelings, cameras relabeled (``cam_rows[new] = old``).  The naive
    ``dataclasses.replace(problem, points3d=pts)`` is only correct for the
    flat layout — this helper handles every engine's problem type.
    """
    import dataclasses

    import jax.numpy as jnp

    rows = getattr(problem, "point_rows", None)
    if rows is None:
        new_pts = jnp.asarray(pts)
    else:
        rows = jnp.asarray(rows)
        vals = jnp.asarray(pts)[jnp.clip(rows, 0, None)]
        new_pts = jnp.where((rows >= 0)[:, None], vals, 0.0).astype(
            problem.points3d.dtype
        )
    cam_rows = getattr(problem, "cam_rows", None)
    if cam_rows is None:
        new_cams = cams
    else:
        idx = jnp.asarray(cam_rows)
        new_cams = jax.tree_util.tree_map(lambda x: jnp.asarray(x)[idx], cams)
    return dataclasses.replace(problem, cameras=new_cams, points3d=new_pts)


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
    Works with any engine's packed problem: pass e.g.
    ``solver_fn=lambda p, c: make_wtt_ba_solver(c)(p)`` — chunk iteration
    counts are dynamic operands, so every chunk reuses one executable.
    """
    from tpu3drecon.problems.packing import CameraParams
    from tpu3drecon.solvers.bundle_adjust import ba_solve

    solver_fn = solver_fn or ba_solve
    total = config.maxiter
    chunk_config = config._replace(maxiter=chunk_iters)

    done = 0
    cams, pts, state = problem.cameras, problem.points3d, None
    step0 = latest_step(checkpoint_dir)
    if step0 is not None:
        saved = restore_state(None, checkpoint_dir)
        cams = CameraParams(
            rmats=jax.numpy.asarray(saved["rmats"]),
            tvecs=jax.numpy.asarray(saved["tvecs"]),
            fx_fy=jax.numpy.asarray(saved["fx_fy"]),
            cx_cy_skew=jax.numpy.asarray(
                saved.get("cx_cy_skew", problem.cameras.cx_cy_skew)
            ),
            dist=jax.numpy.asarray(saved.get("dist", problem.cameras.dist)),
        )
        pts = jax.numpy.asarray(saved["points3d"])
        problem = update_problem_solution(problem, cams, pts)
        done = step0

    # Fault-injection hook: sleep after every checkpoint so kill/resume
    # tests get a deterministic window to SIGKILL the process mid-run.
    delay = float(os.environ.get("TPU3DRECON_CHECKPOINT_DELAY_S", "0") or 0)

    while done < total:
        cams, pts, state = solver_fn(problem, chunk_config)
        done += chunk_iters
        save_state(
            {
                "rmats": cams.rmats,
                "tvecs": cams.tvecs,
                "fx_fy": cams.fx_fy,
                "cx_cy_skew": cams.cx_cy_skew,
                "dist": cams.dist,
                "points3d": pts,
            },
            checkpoint_dir,
            done,
        )
        if delay:
            import time

            time.sleep(delay)
        problem = update_problem_solution(problem, cams, pts)
        if state is not None and bool(jax.device_get(state.converged)):
            break
    return cams, pts, state
