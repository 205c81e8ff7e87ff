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


def pose_problem_from_ba(problem, cameras=None, points3d=None, pad_multiple: int = 256):
    """Repack a (possibly solved) BAProblem as a PoseProblem: per-camera
    observation lists against fixed 3D points (host-side, for the
    calibration alternation below)."""
    import numpy as np

    from tpu3drecon.problems.packing import bucket_size

    cams = cameras if cameras is not None else problem.cameras
    pts = np.asarray(jax.device_get(points3d if points3d is not None else problem.points3d))
    cam_idx = np.asarray(jax.device_get(problem.cam_idx))
    pt_idx = np.asarray(jax.device_get(problem.pt_idx))
    uv = np.asarray(jax.device_get(problem.uv))
    mask = np.asarray(jax.device_get(problem.mask)) > 0
    cam_idx, pt_idx, uv = cam_idx[mask], pt_idx[mask], uv[mask]

    B = cams.n_cameras
    counts = np.bincount(cam_idx, minlength=B)
    n = bucket_size(max(int(counts.max()), 1), pad_multiple)
    p3 = np.zeros((B, n, 3))
    p2 = np.zeros((B, n, 2))
    m = np.zeros((B, n))
    order = np.argsort(cam_idx, kind="stable")
    starts = np.zeros(B + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    local = np.arange(len(order)) - starts[cam_idx[order]]
    p3[cam_idx[order], local] = pts[pt_idx[order]]
    p2[cam_idx[order], local] = uv[order]
    m[cam_idx[order], local] = 1.0

    dtype = problem.uv.dtype
    return PoseProblem(
        cameras=cams,
        points3d=jnp.asarray(p3, dtype),
        points2d=jnp.asarray(p2, dtype),
        mask=jnp.asarray(m, dtype),
        avg_cam_width=problem.avg_cam_width,
    )


def ba_with_intrinsics_calibration(
    problem,
    ba_config=None,
    lm_config: LMConfig = LMConfig(maxiter=60, gtol=1e-12),
    rounds: int = 2,
    refine_distortion: bool = True,
):
    """Joint structure + intrinsics + distortion estimation by alternation.

    BA treats (fx, fy, k1, k2-as-dist) with frozen distortion; this driver
    alternates full BA with per-camera intrinsics+distortion refinement
    (poses/points fixed) — the standard block-coordinate scheme for adding
    distortion calibration to a Schur-structured BA without growing the
    camera parameter block.  Returns (cameras, points3d, last BA state).

    Convergence is LINEAR in ``rounds`` (geometry and distortion are
    strongly coupled: free points partially absorb radial distortion, so
    each alternation peels off a fraction).  Measured on a 6-camera
    synthetic with k=(-0.12, 0.02) from a pinhole init: k1 reaches -0.055 /
    -0.084 / -0.109 after 4 / 8 / 16 rounds (rmse 0.094 / 0.054 / 0.019 px).
    Budget rounds accordingly for tight calibration.
    """
    import dataclasses

    from tpu3drecon.solvers.bundle_adjust import BAConfig, ba_solve

    ba_config = ba_config or BAConfig(maxiter=30, gtol=1e-12, cg_maxiter=30, cg_rtol=1e-8)
    cams = problem.cameras
    pts = problem.points3d
    state = None
    for _ in range(rounds):
        problem = dataclasses.replace(problem, cameras=cams, points3d=pts)
        cams, pts, state = ba_solve(problem, ba_config)
        pose_prob = pose_problem_from_ba(problem, cams, pts)
        cams, _ = refine_intrinsics(
            pose_prob, config=lm_config, refine_distortion=refine_distortion
        )
    problem = dataclasses.replace(problem, cameras=cams, points3d=pts)
    cams, pts, state = ba_solve(problem, ba_config)
    return cams, pts, state
