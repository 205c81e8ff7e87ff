"""Per-camera intrinsics + radial-distortion refinement (poses fixed).

Calibration-style refinement the reference has no counterpart for: with
camera poses and 3D points held fixed, optimize each camera's
``[fx, fy, k1, k2]`` against its observations — batched across cameras with
``vmap`` over the first-party LM engine (solvers/lm_core.py), one compiled
executable, exactly like pose refinement (solvers/pose_refine.py).

Use cases: recover distortion coefficients COLMAP/BAL files carry only
approximately, refine focal after a pose-only solve, or initialize the full
BA's frozen ``dist`` field from data.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from tpu3drecon.geometry.losses import RobustLoss, robust_weight
from tpu3drecon.geometry.projection import project_points
from tpu3drecon.problems.packing import CameraParams, PoseProblem
from tpu3drecon.solvers.lm_core import LMConfig, LMState, lm_solve


def intrinsics_residuals(
    params: jax.Array,  # (4,) [fx, fy, k1, k2]
    rmat: jax.Array,
    tvec: jax.Array,
    cx_cy_skew: jax.Array,
    points3d: jax.Array,
    points2d: jax.Array,
    mask: jax.Array,
    avg_cam_width: jax.Array,
    loss: RobustLoss = RobustLoss.TRIVIAL,
) -> jax.Array:
    """Whitened per-axis residuals (2N,) as a function of intrinsics only."""
    proj = project_points(rmat, tvec, params[:2], cx_cy_skew, params[2:4], points3d)
    r = proj - points2d
    s = jnp.sum(r * r, axis=1)
    w = robust_weight(loss, jax.lax.stop_gradient(s))
    return (r * (jnp.sqrt(w) * mask / avg_cam_width)[:, None]).reshape(-1)


def refine_intrinsics(
    problem: PoseProblem,
    loss: RobustLoss = RobustLoss.TRIVIAL,
    config: LMConfig = LMConfig(maxiter=60, gtol=1e-10),
    refine_distortion: bool = True,
) -> Tuple[CameraParams, LMState]:
    """Refine [fx, fy, k1, k2] per camera; returns updated CameraParams.

    ``refine_distortion=False`` freezes (k1, k2) at their current values and
    refines focal lengths only (the Jacobian columns for k are masked, so the
    batched solve stays one executable for both modes).
    """
    cams = problem.cameras
    params0 = jnp.concatenate([cams.fx_fy, cams.dist], axis=1)  # (B, 4)
    norm = problem.avg_cam_width.astype(params0.dtype)
    res_fn = functools.partial(intrinsics_residuals, loss=loss)

    if refine_distortion:
        fn = res_fn
    else:
        def fn(params, rmat, tvec, ccs, p3, p2, mask, width):
            frozen = jnp.concatenate(
                [params[:2], jax.lax.stop_gradient(params[2:4])]
            )
            return res_fn(frozen, rmat, tvec, ccs, p3, p2, mask, width)

    def solve_one(p0, rmat, tvec, ccs, p3, p2, mask):
        return lm_solve(fn, p0, rmat, tvec, ccs, p3, p2, mask, norm, config=config)

    solver = jax.jit(jax.vmap(solve_one))
    params, state = solver(
        params0,
        cams.rmats,
        cams.tvecs,
        cams.cx_cy_skew,
        problem.points3d,
        problem.points2d,
        problem.mask,
    )
    new_cams = CameraParams(
        rmats=cams.rmats,
        tvecs=cams.tvecs,
        fx_fy=params[:, :2],
        cx_cy_skew=cams.cx_cy_skew,
        dist=params[:, 2:4] if refine_distortion else cams.dist,
    )
    return new_cams, state
