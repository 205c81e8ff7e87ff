"""Pallas kernel: point-side BA normal-equation reduction.

Consumes the residual / point-Jacobian rows gathered via the track table
(XLA expresses gathers; scatters and the blocked 3x3 algebra are what this
kernel fuses) and produces per-point damped-V inverses and gradients in one
VMEM pass:

  - V_p     = sum_t Jp_t^T Jp_t   (3x3, damped)
  - v_inv_p = (V_p + lam diag)^{-1}  via closed-form adjugate
  - g_p     = sum_t Jp_t^T r_t

Input layout: the three Jacobian COLUMNS arrive as separate (P, T2) planes
(T2 = 2*T residual rows per point) — a trailing (T2, 3) block would be
tile-padded 3 -> 128 lanes by Mosaic and blow the VMEM budget (measured:
18.5M scoped vs the 16M limit at P_BLK=512).  With component planes every
block is a clean (P_BLK, T2) tile and all math is plane arithmetic.

Tested against the XLA grid engine in tests/test_pallas_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _point_normal_kernel(
    lam_ref,  # (1, 1) SMEM damping
    jpx_ref,  # (P_BLK, T2) VMEM: Jp column x over residual rows
    jpy_ref,  # (P_BLK, T2)
    jpz_ref,  # (P_BLK, T2)
    r_ref,  # (P_BLK, T2) gathered residual rows
    vinv_ref,  # (P_BLK, 3, 3) out
    g_ref,  # (P_BLK, 1, 3) out
    damp_ref,  # (P_BLK, 1, 3) out: damping actually added (for gain ratio)
    *,
    diag_floor: float,
):
    lam = lam_ref[0, 0]
    cols = (jpx_ref[...], jpy_ref[...], jpz_ref[...])
    r = r_ref[...]

    # V entries as (P_BLK,) planes: V[i][j] = sum_t col_i * col_j.
    v = [[jnp.sum(cols[i] * cols[j], axis=1) for j in range(3)] for i in range(3)]
    g = [jnp.sum(cols[i] * r, axis=1) for i in range(3)]

    d0 = lam * jnp.maximum(v[0][0], diag_floor)
    d1 = lam * jnp.maximum(v[1][1], diag_floor)
    d2 = lam * jnp.maximum(v[2][2], diag_floor)
    a, b_, c = v[0][0] + d0, v[0][1], v[0][2]
    d, e, f = v[1][0], v[1][1] + d1, v[1][2]
    gg, h, i_ = v[2][0], v[2][1], v[2][2] + d2

    co_a = e * i_ - f * h
    co_b = c * h - b_ * i_
    co_c = b_ * f - c * e
    det = a * co_a + d * co_b + gg * co_c
    det_safe = jnp.where(jnp.abs(det) < 1e-32, jnp.ones_like(det), det)
    inv_det = 1.0 / det_safe

    vinv = jnp.stack(
        [
            jnp.stack([co_a, co_b, co_c], axis=-1),
            jnp.stack([f * gg - d * i_, a * i_ - c * gg, c * d - a * f], axis=-1),
            jnp.stack([d * h - e * gg, b_ * gg - a * h, a * e - b_ * d], axis=-1),
        ],
        axis=-2,
    ) * inv_det[:, None, None]

    vinv_ref[...] = vinv
    g_ref[:, 0, :] = jnp.stack(g, axis=-1)
    damp_ref[:, 0, :] = jnp.stack([d0, d1, d2], axis=-1)


@functools.partial(jax.jit, static_argnames=("block_points", "interpret"))
def point_normal_fused(
    jp_g: jax.Array,  # (P, T2, 3) track-gathered whitened point Jacobians
    r_g: jax.Array,  # (P, T2) track-gathered whitened residuals
    lam: jax.Array,  # () damping
    diag_floor: float = 1e-8,
    block_points: int = 512,
    interpret: bool = False,
):
    """Returns (v_inv (P,3,3), g_pt (P,3), damp_pt (P,3))."""
    p, t2, _ = jp_g.shape
    dtype = jp_g.dtype
    if p % block_points != 0:
        raise ValueError(f"P={p} must be a multiple of block_points={block_points}")
    grid = (p // block_points,)
    lam_arr = jnp.reshape(lam.astype(dtype), (1, 1))
    # Component planes (kernel-friendly tiles).
    jpx = jp_g[..., 0]
    jpy = jp_g[..., 1]
    jpz = jp_g[..., 2]

    kernel = functools.partial(_point_normal_kernel, diag_floor=diag_floor)
    plane_spec = pl.BlockSpec(
        (block_points, t2), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    vinv, g, damp = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            plane_spec,
            plane_spec,
            plane_spec,
            plane_spec,
        ],
        out_specs=[
            pl.BlockSpec((block_points, 3, 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_points, 1, 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_points, 1, 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((p, 3, 3), dtype),
            jax.ShapeDtypeStruct((p, 1, 3), dtype),
            jax.ShapeDtypeStruct((p, 1, 3), dtype),
        ],
        interpret=interpret,
    )(lam_arr, jpx, jpy, jpz, r_g)
    return vinv, g[:, 0, :], damp[:, 0, :]
