"""Pallas kernel: fused camera-side BA linearization.

For each camera row of the (C, K) observation grid this kernel computes, in
one VMEM-resident pass over the K axis (lanes):

  - whitened residual planes        r   (2, K)    -> HBM (point side needs it)
  - whitened point-Jacobian planes  jp  (6, K)    -> HBM (point side needs it)
  - the camera JtJ block            U   (8, 8)    -> HBM
  - the camera gradient             g   (8,)      -> HBM

The camera Jacobian Jc (16 planes) is *never materialized to HBM* — the
XLA-level grid engine (solvers/ba_grid.py) writes it out (13+ MB per
linearization, with hostile (2, 8) trailing-dim layouts) and re-reads it for
U and every CG matvec.  Here its planes live in registers/VMEM only, and the
36 symmetric U entries are lane-reductions of plane products.

Inputs use component-major planes with K on the lane axis (K multiple of
128), camera parameters ride along as an (C, 24) SMEM row:
  [R row-major 9 | t 3 | fx fy 2 | cx cy skew 3 | inv_width 1 | k1 k2 2 | pad].

Correctness is pinned against the XLA grid engine in
tests/test_pallas_kernels.py (interpret mode on CPU; compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu3drecon.geometry.losses import RobustLoss

# Camera parameter row layout (SMEM).
PARAM_WIDTH = 24


def pack_camera_params(rmats, tvecs, fx_fy, cx_cy_skew, inv_width, dist) -> jax.Array:
    """(C, 24) parameter rows for the kernel."""
    c = rmats.shape[0]
    dtype = rmats.dtype
    flat = jnp.concatenate(
        [
            rmats.reshape(c, 9),
            tvecs,
            fx_fy,
            cx_cy_skew,
            jnp.full((c, 1), inv_width, dtype),
            dist.astype(dtype),
        ],
        axis=1,
    )
    pad = PARAM_WIDTH - flat.shape[1]
    return jnp.pad(flat, ((0, 0), (0, pad)))


def _cam_normal_kernel(
    params_ref,  # (C, PARAM_WIDTH) SMEM, whole array
    xw_ref,  # (1, 3, K) VMEM: world points gathered onto the grid
    uv_ref,  # (1, 2, K) VMEM
    mask_ref,  # (1, 1, K) VMEM
    r_ref,  # (1, 2, K) out
    jp_ref,  # (1, 6, K) out
    jc_ref,  # (1, 16, K) out: whitened camera-Jacobian planes (row-major)
    u_ref,  # (1, 8, 8) out
    g_ref,  # (1, 1, 8) out
    *,
    loss_mode: int,
):
    cam = pl.program_id(0)
    # SMEM only supports scalar loads.
    def p(i):
        return params_ref[cam, i]

    r00, r01, r02 = p(0), p(1), p(2)
    r10, r11, r12 = p(3), p(4), p(5)
    r20, r21, r22 = p(6), p(7), p(8)
    t0, t1, t2 = p(9), p(10), p(11)
    fx, fy = p(12), p(13)
    cx, cy, sk = p(14), p(15), p(16)
    inv_w = p(17)
    k1, k2 = p(18), p(19)

    xw0 = xw_ref[0, 0, :]
    xw1 = xw_ref[0, 1, :]
    xw2 = xw_ref[0, 2, :]
    mask = mask_ref[0, 0, :]

    # Camera-frame point planes.
    x = r00 * xw0 + r01 * xw1 + r02 * xw2 + t0
    y = r10 * xw0 + r11 * xw1 + r12 * xw2 + t1
    z = r20 * xw0 + r21 * xw1 + r22 * xw2 + t2
    z_safe = jnp.where(jnp.abs(z) < 1e-12, jnp.ones_like(z), z)
    iz = 1.0 / z_safe

    # Radial distortion on normalized coords (same math as ops/jacobians.py):
    # m' = s m, s = 1 + k1 r^2 + k2 r^4;  dm'/dm = s I + g m m^T.
    mx = x * iz
    my = y * iz
    rr2 = mx * mx + my * my
    s_rad = 1.0 + k1 * rr2 + k2 * rr2 * rr2
    g_rad = 2.0 * k1 + 4.0 * k2 * rr2
    mdx = s_rad * mx
    mdy = s_rad * my

    u_px = fx * mdx + sk * mdy + cx
    v_px = fy * mdy + cy
    r0 = u_px - uv_ref[0, 0, :]
    r1 = v_px - uv_ref[0, 1, :]
    s = r0 * r0 + r1 * r1
    # IRLS weights, matching geometry.losses.robust_weight exactly.
    if loss_mode == 1:  # cauchy
        w = 1.0 / (1.0 + s)
    elif loss_mode == 2:  # huber (delta = 1)
        w = jnp.where(s <= 1.0, jnp.ones_like(s), 1.0 / jnp.sqrt(jnp.maximum(s, 1.0)))
    else:  # trivial
        w = jnp.ones_like(s)
    scale = jnp.sqrt(w) * mask * inv_w

    axx = s_rad + g_rad * mx * mx
    axy = g_rad * mx * my
    ayy = s_rad + g_rad * my * my
    b00 = axx * iz
    b01 = axy * iz
    b02 = -(axx * mx + axy * my) * iz
    b10 = axy * iz
    b11 = ayy * iz
    b12 = -(axy * mx + ayy * my) * iz

    a11 = fx * b00 + sk * b10
    a12 = fx * b01 + sk * b11
    a13 = fx * b02 + sk * b12
    a21 = fy * b10
    a22 = fy * b11
    a23 = fy * b12
    zero = jnp.zeros_like(a11)

    # Whitened camera-Jacobian planes (held in registers only).
    jc_r0 = [
        (-a12 * z + a13 * y) * scale,
        (a11 * z - a13 * x) * scale,
        (-a11 * y + a12 * x) * scale,
        a11 * scale,
        a12 * scale,
        a13 * scale,
        mdx * scale,
        zero,
    ]
    jc_r1 = [
        (-a22 * z + a23 * y) * scale,
        (a21 * z - a23 * x) * scale,
        (-a21 * y + a22 * x) * scale,
        a21 * scale,
        a22 * scale,
        a23 * scale,
        zero,
        mdy * scale,
    ]

    # Whitened point-Jacobian planes: dpi @ R.
    jp00 = (a11 * r00 + a12 * r10 + a13 * r20) * scale
    jp01 = (a11 * r01 + a12 * r11 + a13 * r21) * scale
    jp02 = (a11 * r02 + a12 * r12 + a13 * r22) * scale
    jp10 = (a21 * r00 + a22 * r10 + a23 * r20) * scale
    jp11 = (a21 * r01 + a22 * r11 + a23 * r21) * scale
    jp12 = (a21 * r02 + a22 * r12 + a23 * r22) * scale

    rw0 = r0 * scale
    rw1 = r1 * scale

    r_ref[0, 0, :] = rw0
    r_ref[0, 1, :] = rw1
    for i in range(8):
        jc_ref[0, i, :] = jc_r0[i]
        jc_ref[0, 8 + i, :] = jc_r1[i]
    jp_ref[0, 0, :] = jp00
    jp_ref[0, 1, :] = jp01
    jp_ref[0, 2, :] = jp02
    jp_ref[0, 3, :] = jp10
    jp_ref[0, 4, :] = jp11
    jp_ref[0, 5, :] = jp12

    # U = sum_k jc^T jc (8x8 symmetric) and g = sum_k jc^T r: 36 + 8 lane
    # reductions of plane products, assembled into whole-block stores.
    vals = {}
    for i in range(8):
        for j in range(i, 8):
            vals[(i, j)] = jnp.sum(jc_r0[i] * jc_r0[j] + jc_r1[i] * jc_r1[j])
    u_mat = jnp.stack(
        [
            jnp.stack([vals[(min(i, j), max(i, j))] for j in range(8)])
            for i in range(8)
        ]
    )
    g_vec = jnp.stack(
        [jnp.sum(jc_r0[i] * rw0 + jc_r1[i] * rw1) for i in range(8)]
    )
    u_ref[0, :, :] = u_mat
    g_ref[0, 0, :] = g_vec


@functools.partial(jax.jit, static_argnames=("loss", "interpret"))
def cam_normal_fused(
    rmats: jax.Array,  # (C, 3, 3)
    tvecs: jax.Array,  # (C, 3)
    fx_fy: jax.Array,  # (C, 2)
    cx_cy_skew: jax.Array,  # (C, 3)
    dist: jax.Array,  # (C, 2) radial (k1, k2)
    x_w: jax.Array,  # (C, 3, K) grid-gathered world points (planes)
    uv: jax.Array,  # (C, 2, K) observation planes
    mask: jax.Array,  # (C, K)
    inv_width: jax.Array,  # ()
    loss: RobustLoss = RobustLoss.TRIVIAL,
    interpret: bool = False,
):
    """Returns (r (C,2,K), jp (C,6,K), jc (C,16,K), U (C,8,8), g (C,8))."""
    c, _, k = x_w.shape
    dtype = x_w.dtype
    params = pack_camera_params(rmats, tvecs, fx_fy, cx_cy_skew, inv_width, dist)

    mode = {RobustLoss.TRIVIAL: 0, RobustLoss.CAUCHY: 1, RobustLoss.HUBER: 2}[loss]
    kernel = functools.partial(_cam_normal_kernel, loss_mode=mode)
    # Mosaic requires the last two block dims to equal the array dims (or be
    # tile multiples): params ride whole in SMEM (indexed by program_id),
    # mask/g get a unit middle axis.
    r, jp, jc, u, g = pl.pallas_call(
        kernel,
        grid=(c,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 2, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 6, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, 2, k), dtype),
            jax.ShapeDtypeStruct((c, 6, k), dtype),
            jax.ShapeDtypeStruct((c, 16, k), dtype),
            jax.ShapeDtypeStruct((c, 8, 8), dtype),
            jax.ShapeDtypeStruct((c, 1, 8), dtype),
        ],
        interpret=interpret,
    )(params, x_w, uv, mask[:, None, :])
    return r, jp, jc, u, g[:, 0, :]
