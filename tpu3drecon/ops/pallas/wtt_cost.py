"""Pallas kernel: fused cost evaluation (wtt).

The XLA cost path expands the 19-column camera table into per-slot
planes through the dense one-hot (``ba_wtt._cam_planes_w``: ~1 GB
one-hot read + a ~330 MB plane transient written and re-read) before a
cheap elementwise projection — 7.0 ms of the 67.3 ms BAL LM body
(experiments/tpu_fixed_phases.py).  This kernel rebuilds one-hot tiles
in VMEM from ``WTTBucket.wcam`` (iota-compare), selects the camera rows
with exact bf16-split dots (the f32 table is reconstructed exactly at
terms=3 — each partial bf16_term x {0,1} is exact), projects, and
reduces the masked robust squared error per point column, all in one
pass: HBM traffic drops to one read of pts/uv/mask + the 2-byte slot
indices.

Values are the same per-slot residuals as ``ba_wtt._cost``; f32
accumulation order differs (per-tile column partials), the engines'
documented f32 trajectory-variance class.  The f64 CPU-mesh path uses
one exact dot per tile instead of the split.

No reference counterpart: the reference evaluates dense residuals
through jaxopt (src/reconstruction/bundle_adjustment/bundle_adjustment.py:83-91).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu3drecon.geometry.losses import RobustLoss, robust_weight


def _cost_kernel(
    wcam_ref,  # (1, tb, NB) int32 window-relative camera index (-1 = pad)
    tw_ref,  # (1, D, W) transposed camera-table window rows
    pts_ref,  # (1, 3, NB)
    uv_ref,  # (1, 2, tb, NB)
    mask_ref,  # (1, tb, NB)
    out_ref,  # (1, 1, NB) partial sums per point column
    *,
    tb: int,
    window: int,
    loss: RobustLoss,
    terms: int,
):
    acc_t = tw_ref.dtype
    nb = wcam_ref.shape[2]
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (window, nb), 0)
    tw_t = tw_ref[0]  # (D, W)

    def split_dot(x, oh_bf):
        """(D, NB) = x (D, W) f32 . one-hot (W, NB) — exact at terms=3;
        split terms stacked into one dot (splitdot.py, round 5)."""
        from tpu3drecon.ops.pallas.splitdot import stacked_split_lhs

        return stacked_split_lhs(x, oh_bf, acc_t, terms, transpose_oh=False)

    px = pts_ref[0, 0, :]  # (NB,)
    py = pts_ref[0, 1, :]
    pz = pts_ref[0, 2, :]
    one = jnp.asarray(1.0, acc_t)
    total = None
    for t in range(tb):
        idx = wcam_ref[0, t, :]
        oh = (w_iota == idx[None, :]).astype(jnp.bfloat16)  # (W, NB)
        cp = split_dot(tw_t, oh)  # (D, NB) — same rows as _cam_planes_w
        x = cp[0] * px + cp[1] * py + cp[2] * pz + cp[9]
        y = cp[3] * px + cp[4] * py + cp[5] * pz + cp[10]
        z = cp[6] * px + cp[7] * py + cp[8] * pz + cp[11]
        iz = one / jnp.where(jnp.abs(z) < 1e-12, one, z)
        mx = x * iz
        my = y * iz
        r2 = mx * mx + my * my
        s_rad = 1.0 + cp[17] * r2 + cp[18] * r2 * r2
        u = cp[12] * s_rad * mx + cp[16] * s_rad * my + cp[14]
        v = cp[13] * s_rad * my + cp[15]
        r0 = u - uv_ref[0, 0, t, :]
        r1 = v - uv_ref[0, 1, t, :]
        s = r0 * r0 + r1 * r1
        wgt = robust_weight(loss, s)
        m = mask_ref[0, t, :]
        part = s * wgt * (m * m)
        total = part if total is None else total + part
    out_ref[0, 0, :] = total


@functools.partial(
    jax.jit,
    static_argnames=("tb", "pc", "window", "loss", "terms", "interpret"),
)
def wtt_cost_cols_idx(
    wcam: jax.Array,  # (G, Tb*Pc) integer window index per slot (-1 = pad)
    tw: jax.Array,  # (G, W, D) camera-table window rows
    pts: jax.Array,  # (3, G, Pc)
    uv: jax.Array,  # (G, 2, Tb, Pc)
    mask: jax.Array,  # (G, Tb, Pc)
    tb: int,
    pc: int,
    window: int,
    loss: RobustLoss,
    terms: int = 3,
    interpret: bool = False,
) -> jax.Array:
    """Masked robust squared-residual column sums (G, Pc); the caller
    multiplies by 0.5 * inv_w^2 and reduces (same factorization as
    ``ba_wtt._cost`` up to f32 accumulation order)."""
    g = wcam.shape[0]
    w = window
    d = tw.shape[2]
    dtype = tw.dtype
    if not interpret and pc % 128 != 0:
        raise ValueError(
            f"wtt cost kernel needs point-chunk padding divisible by 128 "
            f"on TPU (got Pc={pc}); repack with point_chunk>=128"
        )
    itemsize = jnp.dtype(dtype).itemsize
    # VMEM budget: double-buffered input blocks + per-track-row retained
    # one-hot/cp tiles (Mosaic's stack allocator keeps every unrolled
    # iteration's tiles alive — measured on the matvec kernel).
    per_nb = (
        2 * (4 * tb + itemsize * (3 + 3 * tb))
        + tb * (2 * w + (d + 12) * itemsize)
    )
    nb_budget = max(128, int(10_000_000 // max(per_nb, 1)) // 128 * 128)
    nb = next(
        (kk for kk in range(min(896, nb_budget, pc), 127, -128)
         if pc % kk == 0 and kk % 128 == 0),
        pc,
    )
    jb = pc // nb

    kernel = functools.partial(
        _cost_kernel, tb=tb, window=w, loss=loss, terms=terms
    )
    cols = pl.pallas_call(
        kernel,
        grid=(g, jb),
        in_specs=[
            pl.BlockSpec((1, tb, nb), lambda gg, j: (gg, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, w), lambda gg, j: (gg, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, nb), lambda gg, j: (gg, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, tb, nb), lambda gg, j: (gg, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb, nb), lambda gg, j: (gg, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        # (G, 1, Pc) so the last-two block dims are (1 = full, nb).
        out_specs=pl.BlockSpec((1, 1, nb), lambda gg, j: (gg, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, 1, pc), dtype),
        interpret=interpret,
    )(
        wcam.reshape(g, tb, pc).astype(jnp.int32),
        jnp.transpose(tw, (0, 2, 1)),  # (G, D, W)
        jnp.transpose(pts, (1, 0, 2)),  # (G, 3, Pc) — Mosaic needs the
        # last-two block dims full or 8/128-divisible; (1, 3, nb) with
        # 3 = full middle dim qualifies, (3, 1, nb) does not.
        uv,
        mask,
    )
    return cols
