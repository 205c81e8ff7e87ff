"""Analytic per-observation residual/Jacobian blocks for bundle adjustment.

The reference lets jaxopt materialize a dense Jacobian of the whole packed
problem via AD (reference: jaxopt LevenbergMarquardt over
src/reconstruction/bundle_adjustment/bundle_adjustment.py:52-74) — the wall
that caps it at 15 cameras / 400 points.  Here each observation produces
closed-form blocks

    r      (2,)    whitened reprojection residual
    J_cam  (2, 8)  d r / d [so3 delta(3) | dt(3) | dfx, dfy]
    J_pt   (2, 3)  d r / d point

under a *left-multiplicative SE(3) local parameterization*: the camera is
perturbed as  X_c' = exp([delta]_x) (R X + t) + dt, so J blocks are simple
functions of the camera-frame point — the standard manifold formulation
(what Ceres' local parameterization computes), better conditioned than the
reference's global Rodrigues parameters and MUCH cheaper than jacfwd.

These blocks are consumed by the segment-sum JtJ accumulation and the
implicit Schur solve in tpu3drecon.solvers.bundle_adjust, and are the exact
math later fused into the Pallas kernels (tpu3drecon.ops.pallas).
Correctness is pinned against jax.jacfwd in tests/test_jacobians.py.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from tpu3drecon.geometry.losses import RobustLoss, robust_weight
from tpu3drecon.geometry.rotations import rodrigues_to_matrix


class ObsBlocks(NamedTuple):
    residual: jax.Array  # (2,) whitened residual
    j_cam: jax.Array  # (2, 8) whitened camera block
    j_pt: jax.Array  # (2, 3) whitened point block


def obs_blocks(
    rmat: jax.Array,  # (3,3) W2C of this obs's camera
    tvec: jax.Array,  # (3,)
    fx_fy: jax.Array,  # (2,)
    cx_cy_skew: jax.Array,  # (3,)
    dist: jax.Array,  # (2,) radial (k1, k2) on normalized coords; (0,0) = pinhole
    xyz: jax.Array,  # (3,) 3D point (world)
    uv: jax.Array,  # (2,) observation
    mask: jax.Array,  # () 1.0 real / 0.0 padding
    inv_width: jax.Array,  # () 1 / avg_cam_width residual scale
    loss: RobustLoss = RobustLoss.TRIVIAL,
) -> ObsBlocks:
    """Residual + analytic Jacobian blocks for one observation.

    Whitening sqrt(w(s)) * mask * inv_width multiplies both the residual and
    the J rows, so masked (padding) rows contribute exact zeros to r, g, and
    every JtJ block.

    Radial distortion enters the chain rule as the 2x2 factor
        A = s I + (2 k1 + 4 k2 r^2) m m^T,   s = 1 + k1 r^2 + k2 r^4,
    between the intrinsics K2 and the perspective-divide Jacobian dm/dX_c;
    dist = (0, 0) makes A = I and recovers the pure pinhole blocks exactly.
    """
    dtype = xyz.dtype
    xc = rmat @ xyz + tvec  # camera-frame point
    x, y, z = xc[0], xc[1], xc[2]
    # Guard z for padding rows (masked to zero anyway).
    z_safe = jnp.where(jnp.abs(z) < 1e-12, jnp.asarray(1.0, dtype), z)
    inv_z = 1.0 / z_safe
    fx, fy = fx_fy[0], fx_fy[1]
    skew = cx_cy_skew[2]
    k1, k2 = dist[0], dist[1]

    mx, my = x * inv_z, y * inv_z
    r2 = mx * mx + my * my
    s_rad = 1.0 + k1 * r2 + k2 * r2 * r2
    g_rad = 2.0 * k1 + 4.0 * k2 * r2
    mdx, mdy = s_rad * mx, s_rad * my

    u = fx * mdx + skew * mdy + cx_cy_skew[0]
    v = fy * mdy + cx_cy_skew[1]
    r = jnp.stack([u, v]) - uv

    s = jnp.dot(r, r)
    w = robust_weight(loss, jax.lax.stop_gradient(s))
    scale = jnp.sqrt(w) * mask * inv_width

    # d m'/dX_c = A @ dm/dX_c with A = s I + g m m^T and
    # dm/dX_c = [[iz, 0, -mx iz], [0, iz, -my iz]].
    a00 = s_rad + g_rad * mx * mx
    a01 = g_rad * mx * my
    a11 = s_rad + g_rad * my * my
    b00 = a00 * inv_z
    b01 = a01 * inv_z
    b02 = -(a00 * mx + a01 * my) * inv_z
    b10 = a01 * inv_z
    b11 = a11 * inv_z
    b12 = -(a01 * mx + a11 * my) * inv_z
    # dpi/dX_c = K2 @ dm'/dX_c (2x3); row 2 gains a nonzero first entry when
    # distortion couples the axes.
    dpi = jnp.array(
        [
            [fx * b00 + skew * b10, fx * b01 + skew * b11, fx * b02 + skew * b12],
            [fy * b10, fy * b11, fy * b12],
        ]
    )

    # Camera blocks under left-mult SE(3) perturbation:
    #   dX_c/d delta = -[X_c]_x,  dX_c/d dt = I.
    zero = jnp.zeros((), dtype)
    neg_skew_xc = jnp.array(
        [
            [zero, z, -y],
            [-z, zero, x],
            [y, -x, zero],
        ]
    )  # == -[X_c]_x
    j_rot = dpi @ neg_skew_xc  # (2,3)
    j_t = dpi  # (2,3)
    # Focal block: du/dfx = m'_x, dv/dfy = m'_y.
    j_f = jnp.array([[mdx, zero], [zero, mdy]])
    j_cam = jnp.concatenate([j_rot, j_t, j_f], axis=1)  # (2,8)

    # Point block: dX_c/dX = R.
    j_pt = dpi @ rmat  # (2,3)

    return ObsBlocks(residual=r * scale, j_cam=j_cam * scale, j_pt=j_pt * scale)


def gather_obs_blocks(
    rmats: jax.Array,  # (C,3,3)
    tvecs: jax.Array,  # (C,3)
    fx_fy: jax.Array,  # (C,2)
    cx_cy_skew: jax.Array,  # (C,3)
    dist: jax.Array,  # (C,2)
    points3d: jax.Array,  # (P,3)
    cam_idx: jax.Array,  # (N,)
    pt_idx: jax.Array,  # (N,)
    uv: jax.Array,  # (N,2)
    mask: jax.Array,  # (N,)
    inv_width: jax.Array,  # ()
    loss: RobustLoss = RobustLoss.TRIVIAL,
) -> ObsBlocks:
    """Vectorized blocks for a flat observation list (gathers by index)."""
    fn = jax.vmap(obs_blocks, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, None, None))
    return fn(
        rmats[cam_idx],
        tvecs[cam_idx],
        fx_fy[cam_idx],
        cx_cy_skew[cam_idx],
        dist[cam_idx],
        points3d[pt_idx],
        uv,
        mask,
        inv_width,
        loss,
    )


def apply_se3_retraction(
    rmats: jax.Array,  # (C,3,3)
    tvecs: jax.Array,  # (C,3)
    fx_fy: jax.Array,  # (C,2)
    step_cam: jax.Array,  # (C,8) [delta | dt | dfx, dfy]
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Left-multiplicative retraction matching the obs_blocks linearization:
    R <- exp([delta]_x) R,  t <- exp([delta]_x) t + dt,  f <- f + df."""
    delta = step_cam[:, :3]
    dt = step_cam[:, 3:6]
    df = step_cam[:, 6:8]
    dr = jax.vmap(rodrigues_to_matrix)(delta)
    new_r = jnp.einsum("cij,cjk->cik", dr, rmats)
    new_t = jnp.einsum("cij,cj->ci", dr, tvecs) + dt
    return new_r, new_t, fx_fy + df
