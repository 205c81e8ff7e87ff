"""Pallas kernel: fused contribution planes + one-hot reduction (wtt).

The XLA linearization's contribution block dominates the BAL-scale fixed
cost: 33.2 ms of the 41.5 ms linearize (experiments/tpu_lin_phases2.py)
against a ~5 ms byte floor.  The batched XLA form materializes every
intermediate plane family in HBM — u pairs (36 planes), gradient planes
(8), the W factor (24), W V^-1 (24), coupling pairs (36), plus two
80-plane concatenates — roughly 8-9 GB of traffic per LM iteration for
math whose inputs are 0.4 GB.

This kernel computes, per (group, point-block) grid step and track row:

  u[(i,j)]  = jc_i . jc_j            (damped-U upper triangle, diag-major)
  g[i]      = jc_i . r               (camera gradient columns)
  coup[(i,j)] = (W V^-1 W^T)[(i,j)]  (Schur-Jacobi coupling, optional)
  od[i,j]   = S_{c,c+1} pair rows    (band preconditioners, optional:
                                      wv(slot t) x w(slot t+1) reduced
                                      through in-VMEM adjacent-pair
                                      one-hots)

entirely in VMEM/registers, then reduces slots into window-camera rows
through a one-hot tile REBUILT from ``WTTBucket.wcam`` (iota-compare)
with exact 3-term bf16-split dots — the same two tricks as the index
matvec kernel (ops/pallas/wtt_matvec.py): HBM traffic drops to one read
of jc/jp/r/v_inv + the 2-byte-per-slot indices, and the Mosaic dots pay
3 MXU passes instead of HIGHEST's 6 while every partial product
bf16_term x {0,1} stays exact.

Values are the same products/sums as ba_tt._u_g_contribs_batched /
_coupling_offdiag_batched reduced by the one-hot einsum; f32 accumulation
order differs (per-tile and per-track-row partial sums), the engines'
documented f32 trajectory-variance class.  The f64 CPU-mesh path uses
one exact dot per tile instead of the split.

No reference counterpart: the reference materializes dense Jacobians and
explicit J^T J (src/reconstruction/bundle_adjustment/bundle_adjustment.py:83-91).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _contrib_kernel(
    wcam_ref,  # (1, tb, NB) int32 window-relative camera index (-1 = pad)
    jc_ref,  # (2*np, 1, Tb, NB)
    jp_ref,  # (6, 1, Tb, NB)
    r_ref,  # (2, 1, Tb, NB)
    vinv_ref,  # (1, 6, NB)
    out_ref,  # (1, W, K) contribution rows, accumulated over j
    *,
    np_cam: int,
    tb: int,
    window: int,
    use_sj: bool,
    want_od: bool,
    terms: int,
):
    j = pl.program_id(1)
    acc_t = jc_ref.dtype
    nb = wcam_ref.shape[2]
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (window, nb), 0)

    def split_dot(oh_bf, data):
        """(W, K) += one-hot^T-reduction of (K, nb) f32 data tiles.

        ``terms=0``: one HIGHEST-precision dot (6 MXU passes, no VPU
        split chain) — exact like terms=3; which wins depends on whether
        the kernel is MXU- or VPU-bound (the contribution operand is
        ~99 planes wide, so the 2-op-per-plane split chain is real VPU
        work here, unlike the 9-plane matvec operands)."""
        dims = (((1,), (1,)), ((), ()))
        if acc_t == jnp.float64 or terms == 0:
            return jax.lax.dot_general(
                oh_bf.astype(acc_t), data,
                dimension_numbers=dims,
                preferred_element_type=acc_t,
                precision=jax.lax.Precision.HIGHEST,
            )
        acc = None
        rem = data
        for _ in range(terms):
            h = rem.astype(jnp.bfloat16)
            rem = rem - h.astype(acc_t)
            part = jax.lax.dot_general(
                oh_bf, h,
                dimension_numbers=dims,
                preferred_element_type=acc_t,
                precision=jax.lax.Precision.DEFAULT,
            )
            acc = part if acc is None else acc + part
        return acc

    sym_idx = ((0, 1, 2), (1, 3, 4), (2, 4, 5))
    acc = None
    acc_od = None
    prev_wv = prev_idx = None
    for t in range(tb):
        idx = wcam_ref[0, t, :]  # (NB,)
        oh = (w_iota == idx[None, :]).astype(jnp.bfloat16)  # (W, NB)

        jc0 = jc_ref[:np_cam, 0, t, :]  # (np, NB)
        jc1 = jc_ref[np_cam:, 0, t, :]
        r0 = r_ref[0, 0, t, :]  # (NB,)
        r1 = r_ref[1, 0, t, :]
        # Diagonal-major u pairs + gradient columns (matches
        # ba_tt._triu_pairs order, asserted in the wrapper).
        parts = [
            jc0[: np_cam - d] * jc0[d:] + jc1[: np_cam - d] * jc1[d:]
            for d in range(np_cam)
        ]
        parts.append(jc0 * r0[None] + jc1 * r1[None])
        if use_sj:
            jp0 = jp_ref[:3, 0, t, :]  # (3, NB)
            jp1 = jp_ref[3:, 0, t, :]
            v = vinv_ref[0]  # (6, NB)
            w_l = [
                jc0 * jp0[l][None] + jc1 * jp1[l][None] for l in range(3)
            ]  # 3 x (np, NB)
            wv_l = [
                w_l[0] * v[sym_idx[0][l]][None]
                + w_l[1] * v[sym_idx[1][l]][None]
                + w_l[2] * v[sym_idx[2][l]][None]
                for l in range(3)
            ]
            parts.extend(
                sum(
                    wv_l[l][: np_cam - d] * w_l[l][d:] for l in range(3)
                )
                for d in range(np_cam)
            )
        contrib = jnp.concatenate(parts, axis=0)  # (K, NB)
        part = split_dot(oh, contrib)  # (W, K)
        acc = part if acc is None else acc + part
        if want_od:
            # Band S_{c,c+1} pair rows: od[i, j] at track slot t-1 pairs
            # wv(t-1) with w(t), reduced through the ADJACENT-pair one-hot
            # (slot t-1 on window row w AND slot t on row w+1 — the same
            # pair_oh the XLA path builds by rolling the dense one-hot
            # along the window axis; track camera lists are strictly
            # increasing so no wrap row exists).
            if prev_wv is not None:
                pair = (
                    (w_iota == prev_idx[None, :])
                    & (w_iota + 1 == idx[None, :])
                ).astype(jnp.bfloat16)
                od = jnp.concatenate(
                    [
                        prev_wv[0][i][None] * w_l[0]
                        + prev_wv[1][i][None] * w_l[1]
                        + prev_wv[2][i][None] * w_l[2]
                        for i in range(np_cam)
                    ],
                    axis=0,
                )  # (np*np, NB), i-major
                od_part = split_dot(pair, od)
                acc_od = od_part if acc_od is None else acc_od + od_part
            prev_wv, prev_idx = wv_l, idx
    if want_od:
        if acc_od is None:  # tb == 1: no adjacent pairs
            acc_od = jnp.zeros((window, np_cam * np_cam), acc.dtype)
        acc = jnp.concatenate([acc, acc_od], axis=1)

    @pl.when(j == 0)
    def _():
        out_ref[0] = acc

    @pl.when(j != 0)
    def _():
        out_ref[0] = out_ref[0] + acc


def _cam_planes_kernel(
    wcam_ref,  # (1, tb, NB) int32 window-relative camera index (-1 = pad)
    tw_ref,  # (1, D, W) transposed camera-table window rows
    out_ref,  # (1, D, tb, NB) per-slot camera parameter planes
    *,
    tb: int,
    window: int,
    terms: int,
):
    """Per-slot camera parameter planes from index-rebuilt one-hots —
    ``ba_wtt._cam_planes_w`` without the dense one-hot read.  Exact at
    terms=3 (selection of f32 table rows reconstructed from three bf16
    split terms; each partial bf16_term x {0,1} is exact)."""
    acc_t = tw_ref.dtype
    nb = wcam_ref.shape[2]
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (window, nb), 0)
    tw_t = tw_ref[0]  # (D, W)

    for t in range(tb):
        idx = wcam_ref[0, t, :]
        oh = (w_iota == idx[None, :]).astype(jnp.bfloat16)  # (W, NB)
        dims = (((1,), (0,)), ((), ()))
        if acc_t == jnp.float64:
            cp = jax.lax.dot_general(
                tw_t, oh.astype(acc_t), dimension_numbers=dims,
                preferred_element_type=acc_t,
                precision=jax.lax.Precision.HIGHEST,
            )
        else:
            cp = None
            rem = tw_t
            for _ in range(terms):
                h = rem.astype(jnp.bfloat16)
                rem = rem - h.astype(acc_t)
                part = jax.lax.dot_general(
                    h, oh, dimension_numbers=dims,
                    preferred_element_type=acc_t,
                    precision=jax.lax.Precision.DEFAULT,
                )
                cp = part if cp is None else cp + part
        out_ref[0, :, t, :] = cp


@functools.partial(
    jax.jit,
    static_argnames=("tb", "pc", "window", "terms", "interpret"),
)
def wtt_cam_planes_idx(
    wcam: jax.Array,  # (G, Tb*Pc)
    tw: jax.Array,  # (G, W, D) camera-table window rows
    tb: int,
    pc: int,
    window: int,
    terms: int = 3,
    interpret: bool = False,
) -> jax.Array:
    """(G, D, Tb, Pc) per-slot camera planes from the index encoding."""
    g = wcam.shape[0]
    w = window
    d = tw.shape[2]
    dtype = tw.dtype
    if not interpret and pc % 128 != 0:
        raise ValueError(
            f"wtt cam-planes kernel needs point-chunk padding divisible "
            f"by 128 on TPU (got Pc={pc}); repack with point_chunk>=128"
        )
    itemsize = jnp.dtype(dtype).itemsize
    per_nb = (
        2 * (4 * tb + d * itemsize * tb)
        + tb * (2 * w + 2 * d * itemsize)
    )
    nb_budget = max(128, int(10_000_000 // max(per_nb, 1)) // 128 * 128)
    nb = next(
        (kk for kk in range(min(896, nb_budget, pc), 127, -128)
         if pc % kk == 0 and kk % 128 == 0),
        pc,
    )
    kernel = functools.partial(
        _cam_planes_kernel, tb=tb, window=w, terms=terms
    )
    return pl.pallas_call(
        kernel,
        grid=(g, pc // nb),
        in_specs=[
            pl.BlockSpec((1, tb, nb), lambda gg, j: (gg, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, w), lambda gg, j: (gg, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d, tb, nb), lambda gg, j: (gg, 0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, d, tb, pc), dtype),
        interpret=interpret,
    )(
        wcam.reshape(g, tb, pc).astype(jnp.int32),
        jnp.transpose(tw, (0, 2, 1)),  # (G, D, W)
    )


@functools.partial(
    jax.jit,
    static_argnames=("np_cam", "tb", "pc", "window", "use_sj", "want_od",
                     "terms", "interpret"),
)
def wtt_contrib_rows_idx(
    wcam: jax.Array,  # (G, Tb*Pc) integer window index per slot (-1 = pad)
    jc: jax.Array,  # (2np, G, Tb, Pc)
    jp: jax.Array,  # (6, G, Tb, Pc)
    r: jax.Array,  # (2, G, Tb, Pc)
    v_inv: jax.Array,  # (6, G, Pc)
    np_cam: int,
    tb: int,
    pc: int,
    window: int,
    use_sj: bool,
    want_od: bool = False,
    terms: int = 3,
    interpret: bool = False,
) -> jax.Array:
    """Window-camera contribution rows (G, W, K) from index-encoded
    one-hots; K = n_triu + np [+ n_triu with ``use_sj``] [+ np^2 band
    pair rows with ``want_od``], columns in the ba_tt diagonal-major
    _triu_pairs order (u | g [| coupling] [| od])."""
    if want_od and not use_sj:
        raise ValueError("want_od requires use_sj (od reuses the W/WV tiles)")
    g = wcam.shape[0]
    w = window
    dtype = jc.dtype
    n_triu = np_cam * (np_cam + 1) // 2
    k = (
        n_triu
        + np_cam
        + (n_triu if use_sj else 0)
        + (np_cam * np_cam if want_od else 0)
    )
    if not interpret and pc % 128 != 0:
        raise ValueError(
            f"wtt contribution kernel needs point-chunk padding divisible "
            f"by 128 on TPU (got Pc={pc}); repack with point_chunk>=128"
        )
    itemsize = jnp.dtype(dtype).itemsize
    # VMEM budget: double-buffered input blocks + per-track-row retained
    # tiles (Mosaic's stack allocator keeps every unrolled iteration's
    # one-hot/contrib tiles alive — measured on the matvec kernel).
    per_nb = (
        2 * (4 * tb + itemsize * tb * (2 * np_cam + 6 + 2) + 6 * itemsize)
        + tb * (2 * w + (itemsize + 2 * 2) * k + 8 * itemsize * np_cam)
        + (tb * 2 * w if want_od else 0)  # retained pair one-hot tiles
    )
    nb_budget = max(128, int(10_000_000 // max(per_nb, 1)) // 128 * 128)
    nb = next(
        (kk for kk in range(min(896, nb_budget, pc), 127, -128)
         if pc % kk == 0 and kk % 128 == 0),
        pc,
    )
    jb = pc // nb

    kernel = functools.partial(
        _contrib_kernel, np_cam=np_cam, tb=tb, window=w, use_sj=use_sj,
        want_od=want_od, terms=terms,
    )
    rows = pl.pallas_call(
        kernel,
        grid=(g, jb),
        in_specs=[
            pl.BlockSpec((1, tb, nb), lambda gg, j: (gg, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * np_cam, 1, tb, nb), lambda gg, j: (0, gg, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, 1, tb, nb), lambda gg, j: (0, gg, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, tb, nb), lambda gg, j: (0, gg, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 6, nb), lambda gg, j: (gg, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, w, k), lambda gg, j: (gg, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, w, k), dtype),
        interpret=interpret,
    )(
        wcam.reshape(g, tb, pc).astype(jnp.int32),
        jc,
        jp,
        r,
        jnp.transpose(v_inv, (1, 0, 2)),  # (G, 6, Pc)
    )
    return rows
