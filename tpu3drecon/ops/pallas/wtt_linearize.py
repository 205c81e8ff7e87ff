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


def _reduce_dot(oh_bf, data, acc_t, terms, stack=True):
    """(W, K) += one-hot^T-reduction of (K, nb) data tiles.

    ``terms=0``: one HIGHEST-precision dot (6 MXU passes, no VPU split
    chain) — exact like terms=3; which wins depends on whether the kernel
    is MXU- or VPU-bound.  terms>=1: that many bf16 split terms — every
    partial product bf16_term x {0,1} is exact, so terms=3 reconstructs
    the f32 value exactly while paying DEFAULT-precision MXU passes,
    STACKED into one dot along the K axis when ``stack`` (splitdot.py,
    round 5; the wrappers disable stacking at wide windows where the
    (W, terms*K) pre-fold temporaries would blow the 16 MB VMEM stack)."""
    from tpu3drecon.ops.pallas.splitdot import stacked_split_rhs

    return stacked_split_rhs(oh_bf, data, acc_t, terms, stack)


def _reduce_stack_ok(tb, window, k, terms, itemsize):
    """True when the stacked reduce's per-track-row (W, terms*K) pre-fold
    outputs fit the VMEM stack across ``tb`` unrolled iterations (Mosaic
    retains every unrolled iteration's tiles).  Measured: W=512/K=88/
    Tb=12 compiles stacked (~6.5 MB), W=1664 aborts (~21 MB asked,
    16 MB scoped limit)."""
    return tb * window * terms * k * itemsize <= 8_000_000


def _select_dot(data, oh_bf, acc_t, terms):
    """(D, nb) selection of (D, W) table rows through a (W, nb) one-hot —
    exact at terms=3 (f32) / one HIGHEST dot (f64); split terms stacked
    into one dot along D (splitdot.py, round 5)."""
    from tpu3drecon.ops.pallas.splitdot import stacked_split_lhs

    return stacked_split_lhs(data, oh_bf, acc_t, terms, transpose_oh=False)


_SYM_IDX = ((0, 1, 2), (1, 3, 4), (2, 4, 5))


def _contrib_parts(jc0, jc1, r0, r1, jp0, jp1, v, np_cam, use_sj):
    """Per-slot contribution planes in the ba_tt._triu_pairs diagonal-major
    order: u pairs | gradient [| Schur-Jacobi coupling].  Shared by the
    ref-reading contribution kernel and the fully-fused linearize kernel —
    one source of truth for the in-VMEM contribution math.  Returns
    (parts list, w_l, wv_l); the W/WV factor tiles feed the band
    S_{c,c+1} pair rows when ``want_od``."""
    parts = [
        jc0[: np_cam - d] * jc0[d:] + jc1[: np_cam - d] * jc1[d:]
        for d in range(np_cam)
    ]
    parts.append(jc0 * r0[None] + jc1 * r1[None])
    w_l = wv_l = None
    if use_sj:
        w_l = [jc0 * jp0[l][None] + jc1 * jp1[l][None] for l in range(3)]
        wv_l = [
            w_l[0] * v[_SYM_IDX[0][l]][None]
            + w_l[1] * v[_SYM_IDX[1][l]][None]
            + w_l[2] * v[_SYM_IDX[2][l]][None]
            for l in range(3)
        ]
        parts.extend(
            sum(wv_l[l][: np_cam - d] * w_l[l][d:] for l in range(3))
            for d in range(np_cam)
        )
    return parts, w_l, wv_l


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
    stack: bool,
):
    j = pl.program_id(1)
    acc_t = jc_ref.dtype
    nb = wcam_ref.shape[2]
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (window, nb), 0)

    # The contribution operand is ~99 planes wide, so the 2-op-per-plane
    # split chain in _reduce_dot is real VPU work here (unlike the 9-plane
    # matvec operands) — hence the terms=0 HIGHEST option.
    def split_dot(oh_bf, data):
        return _reduce_dot(oh_bf, data, acc_t, terms, stack)

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
        jp0 = jp_ref[:3, 0, t, :] if use_sj else None  # (3, NB)
        jp1 = jp_ref[3:, 0, t, :] if use_sj else None
        v = vinv_ref[0] if use_sj else None  # (6, NB)
        # Diagonal-major u pairs + gradient columns (matches
        # ba_tt._triu_pairs order, asserted in the wrapper).
        parts, w_l, wv_l = _contrib_parts(
            jc0, jc1, r0, r1, jp0, jp1, v, np_cam, use_sj
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
        out_ref[0, :, t, :] = _select_dot(tw_t, oh, acc_t, terms)


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
        stack=_reduce_stack_ok(tb, w, k, max(terms, 1), itemsize),
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


def _lin_fused_kernel(
    scal_ref,  # (1, 2) SMEM: [lam, inv_w]
    wcam_ref,  # (1, tb, NB) int32 window-relative camera index (-1 = pad)
    tw_ref,  # (1, D, W) transposed camera-table window rows
    pts_ref,  # (1, 3, NB) point coordinates (G-major: Mosaic requires the
    #           last two block dims divisible by (8, 128) or full — a
    #           (3, 1, NB) plane-major block puts a 1 in the sublane dim
    #           and fails lowering on real TPU)
    uv_ref,  # (1, 2, tb, NB) observations
    mask_ref,  # (1, tb, NB)
    rows_ref,  # (1, W, K) contribution rows, accumulated over j
    jc_ref,  # (2*np, 1, tb, NB) camera-Jacobian planes (out)
    jp_ref,  # (6, 1, tb, NB) point-Jacobian planes (out)
    vinv_ref,  # (1, 6, NB) damped point-normal inverse (out, G-major)
    gpt_ref,  # (1, 3, NB) point gradient (out, G-major)
    damp_ref,  # (1, 3, NB) point damping diagonal (out, G-major)
    *,
    blocks_config,
    np_cam: int,
    tb: int,
    window: int,
    use_sj: bool,
    want_od: bool,
    terms: int,
    stack: bool,
):
    """The WHOLE linearization of one (group, point-block) in VMEM.

    Fuses what used to be four HBM round-trips (round-5 verdict item 2):
    camera-plane selection (wtt_cam_planes_idx), the _tt_blocks
    residual/Jacobian planes (XLA elementwise over HBM), the point-side
    normal (v6/g_pt/v_inv — XLA reductions over HBM), and the contribution
    reduction (_contrib_kernel reading jc/jp/r back from HBM).  jc/jp are
    still WRITTEN once (the CG matvec/rhs/backsub kernels stream them every
    iteration) but are never re-read here, and cp/r never exist in HBM at
    all.

    A point's entire track (the Tb axis) lives inside one (g, j) block, so
    the per-point normal v6 -> v_inv is computable locally; contribution
    rows accumulate across j exactly like _contrib_kernel.  The Jacobian
    math is ba_tt._tt_blocks itself (imported lazily — it is pure
    elementwise jnp, and scatter-free since round 5), so the formulas
    cannot drift from the XLA engines'.
    """
    from tpu3drecon.solvers.ba_tt import _sym3_inv_planes, _tt_blocks

    j = pl.program_id(1)
    acc_t = tw_ref.dtype
    nb = wcam_ref.shape[2]
    lam = scal_ref[0, 0]
    inv_w = scal_ref[0, 1]
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (window, nb), 0)
    tw_t = tw_ref[0]  # (D, W)

    # --- selection: per-slot camera-parameter planes (D, tb, NB).
    # ALWAYS exact (terms=3 split / HIGHEST f64): cp defines the Jacobians
    # and residuals themselves — the measured fidelity trap (RESULTS.md
    # round 4b) applies to everything except the CG operator.
    idxs = []
    cps = []
    for t in range(tb):
        idx = wcam_ref[0, t, :]
        oh = (w_iota == idx[None, :]).astype(jnp.bfloat16)
        idxs.append(idx)
        cps.append(_select_dot(tw_t, oh, acc_t, 3))
    cp = jnp.stack(cps, axis=1)  # (D, tb, NB)

    # --- residual/Jacobian planes (identical formulas to the XLA path).
    blocks = _tt_blocks(
        cp, pts_ref[0], uv_ref[0], mask_ref[0], inv_w, blocks_config
    )
    jc, jp, r = blocks.jc, blocks.jp, blocks.r  # (k, tb, NB)
    jc_ref[:, 0] = jc
    jp_ref[:, 0] = jp

    # --- point-side normal (dense over the in-block track axis).
    v6 = jnp.stack(
        [
            jnp.sum(jp[i] * jp[jj] + jp[3 + i] * jp[3 + jj], axis=0)
            for (i, jj) in ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))
        ]
    )  # (6, NB)
    g_pt = jnp.stack(
        [jnp.sum(jp[i] * r[0] + jp[3 + i] * r[1], axis=0) for i in range(3)]
    )
    damp = jnp.stack(
        [
            lam * jnp.clip(v6[0], 1e-8, None),
            lam * jnp.clip(v6[3], 1e-8, None),
            lam * jnp.clip(v6[5], 1e-8, None),
        ]
    )
    v6_d = jnp.stack(
        [v6[0] + damp[0], v6[1], v6[2], v6[3] + damp[1], v6[4], v6[5] + damp[2]]
    )
    v_inv = _sym3_inv_planes(v6_d)  # (6, NB)
    vinv_ref[0] = v_inv
    gpt_ref[0] = g_pt
    damp_ref[0] = damp

    # --- rhs factor vw = V^-1 g_pt: the (W vw) camera rows ride the same
    # one-hot reduce pass as np extra columns (round-5: kills the separate
    # wtt_w_rows_idx rhs pass and its jc/jp HBM re-read).  Association
    # matches the standalone path exactly: V^-1 g first, then W.
    vw0 = v_inv[0] * g_pt[0] + v_inv[1] * g_pt[1] + v_inv[2] * g_pt[2]
    vw1 = v_inv[1] * g_pt[0] + v_inv[3] * g_pt[1] + v_inv[4] * g_pt[2]
    vw2 = v_inv[2] * g_pt[0] + v_inv[4] * g_pt[1] + v_inv[5] * g_pt[2]

    # --- contribution rows (same math/order as _contrib_kernel, plus the
    # rhs block at the end: u | g [| coupling] | rhs [| od]).
    acc = None
    acc_rhs = None
    acc_od = None
    prev_wv = prev_idx = None
    for t in range(tb):
        idx = idxs[t]
        oh = (w_iota == idx[None, :]).astype(jnp.bfloat16)
        jc0 = jc[:np_cam, t, :]
        jc1 = jc[np_cam:, t, :]
        parts, w_l, wv_l = _contrib_parts(
            jc0, jc1, r[0, t, :], r[1, t, :],
            jp[:3, t, :] if use_sj else None,
            jp[3:, t, :] if use_sj else None,
            v_inv if use_sj else None,
            np_cam, use_sj,
        )
        s0r = jp[0, t, :] * vw0 + jp[1, t, :] * vw1 + jp[2, t, :] * vw2
        s1r = jp[3, t, :] * vw0 + jp[4, t, :] * vw1 + jp[5, t, :] * vw2
        rhs_z = jc0 * s0r[None] + jc1 * s1r[None]  # (np, NB)
        exact_inline = terms == 3 or acc_t == jnp.float64
        if exact_inline:
            # One reduce pass covers everything at full fidelity.
            parts = parts + [rhs_z]
        contrib = jnp.concatenate(parts, axis=0)  # (K', NB)
        part = _reduce_dot(oh, contrib, acc_t, terms, stack)
        acc = part if acc is None else acc + part
        if not exact_inline:
            # FIDELITY TRAP (RESULTS.md round 4b): the rhs defines the LM
            # step and must stay at the exact 3-term split even when the
            # contribution reduce runs reduced terms (index2).
            rp = _reduce_dot(oh, rhs_z, acc_t, 3, stack)
            acc_rhs = rp if acc_rhs is None else acc_rhs + rp
        if want_od:
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
                od_part = _reduce_dot(pair, od, acc_t, terms, stack)
                acc_od = od_part if acc_od is None else acc_od + od_part
            prev_wv, prev_idx = wv_l, idx
    if acc_rhs is not None:
        acc = jnp.concatenate([acc, acc_rhs], axis=1)
    if want_od:
        if acc_od is None:  # tb == 1: no adjacent pairs
            acc_od = jnp.zeros((window, np_cam * np_cam), acc.dtype)
        acc = jnp.concatenate([acc, acc_od], axis=1)

    @pl.when(j == 0)
    def _():
        rows_ref[0] = acc

    @pl.when(j != 0)
    def _():
        rows_ref[0] = rows_ref[0] + acc


@functools.partial(
    jax.jit,
    static_argnames=("blocks_config", "np_cam", "tb", "pc", "window",
                     "use_sj", "want_od", "terms", "interpret"),
)
def wtt_linearize_fused_idx(
    wcam: jax.Array,  # (G, Tb*Pc) integer window index per slot (-1 = pad)
    tw: jax.Array,  # (G, W, D) camera-table window rows
    pts: jax.Array,  # (3, G, Pc)
    uv: jax.Array,  # (G, 2, Tb, Pc)
    mask: jax.Array,  # (G, Tb, Pc)
    lam: jax.Array,  # () trust-region damping
    inv_w: jax.Array,  # () residual whitening scale
    blocks_config,  # static-field-only BAConfig for _tt_blocks
    np_cam: int,
    tb: int,
    pc: int,
    window: int,
    use_sj: bool,
    want_od: bool = False,
    terms: int = 3,
    interpret: bool = False,
):
    """Fully-fused linearization: (rows, jc, jp, v_inv, g_pt, damp_pt).

    rows is (G, W, K) with columns u | g [| coupling] | rhs [| od] —
    the wtt_contrib_rows_idx layout plus np rhs columns carrying the
    (W V^-1 g_pt) camera rows (round-5: the rhs product rides the same
    reduce pass, so the separate wtt_w_rows_idx pass and its jc/jp HBM
    re-read disappear; the rhs block stays at the exact 3-term split in
    every terms mode — the measured fidelity trap).  jc (2np, G, Tb, Pc)
    / jp (6, G, Tb, Pc) feed the CG matvec kernels; v_inv/g_pt/damp_pt
    are the (·, G, Pc) point factors.  One kernel pass replaces
    wtt_cam_planes_idx + the XLA _tt_blocks map + the XLA point-normal
    reductions + wtt_contrib_rows_idx + wtt_w_rows_idx."""
    if want_od and not use_sj:
        raise ValueError("want_od requires use_sj (od reuses the W/WV tiles)")
    g = wcam.shape[0]
    w = window
    d = tw.shape[2]
    dtype = tw.dtype
    n_triu = np_cam * (np_cam + 1) // 2
    k = (
        n_triu
        + np_cam
        + (n_triu if use_sj else 0)
        + np_cam  # rhs block
        + (np_cam * np_cam if want_od else 0)
    )
    if not interpret and pc % 128 != 0:
        raise ValueError(
            f"wtt fused linearize kernel needs point-chunk padding divisible "
            f"by 128 on TPU (got Pc={pc}); repack with point_chunk>=128"
        )
    itemsize = jnp.dtype(dtype).itemsize
    # VMEM budget: double-buffered input/output blocks + per-track-row
    # retained tiles (Mosaic's stack allocator keeps every unrolled
    # iteration's tiles alive).  Adds the cp selection planes, the
    # _tt_blocks temporaries (~40 planes live at the widest point), and
    # the jc/jp output blocks to the contribution kernel's accounting.
    per_nb = (
        2 * (4 * tb + itemsize * (3 + 3 * tb) + 4)  # in: wcam/pts/uv/mask
        + itemsize * (2 * np_cam * tb + 6 * tb + 12)  # out: jc/jp/vinv/gpt/damp
        + tb * (
            2 * 2 * w  # one-hot tiles, both passes
            + d * itemsize  # cp planes
            + (itemsize + 2 * 2) * k  # contribution concat + bf16 splits
            + 40 * itemsize  # _tt_blocks temporaries
            + 8 * itemsize * np_cam  # w_l/wv_l factor tiles
        )
        + (tb * 2 * w if want_od else 0)  # retained pair one-hot tiles
    )
    fixed = 2 * d * w * itemsize + w * k * itemsize  # tw double-buf + rows
    nb_budget = max(
        128, int((10_000_000 - fixed) // max(per_nb, 1)) // 128 * 128
    )
    nb = next(
        (kk for kk in range(min(896, nb_budget, pc), 127, -128)
         if pc % kk == 0 and kk % 128 == 0),
        pc,
    )
    jb = pc // nb

    kernel = functools.partial(
        _lin_fused_kernel, blocks_config=blocks_config, np_cam=np_cam,
        tb=tb, window=w, use_sj=use_sj, want_od=want_od, terms=terms,
        stack=_reduce_stack_ok(tb, w, k, max(terms, 1), itemsize),
    )
    scal = jnp.stack([lam.astype(dtype), inv_w.astype(dtype)]).reshape(1, 2)
    # Rank-3 point-factor operands ride G-MAJOR through the kernel
    # ((G, planes, NB) blocks): Mosaic requires the last two block dims
    # divisible by (8, 128) or equal to the array's — plane-major
    # (planes, 1, NB) blocks put a 1 in the sublane dim and fail lowering
    # on real TPU (interpret mode never checks).  The transposes are
    # ~50 MB of HBM traffic at BAL scale, noise next to the jc/jp planes.
    out_shapes = (
        jax.ShapeDtypeStruct((g, w, k), dtype),  # rows
        jax.ShapeDtypeStruct((2 * np_cam, g, tb, pc), dtype),  # jc
        jax.ShapeDtypeStruct((6, g, tb, pc), dtype),  # jp
        jax.ShapeDtypeStruct((g, 6, pc), dtype),  # v_inv (G-major)
        jax.ShapeDtypeStruct((g, 3, pc), dtype),  # g_pt (G-major)
        jax.ShapeDtypeStruct((g, 3, pc), dtype),  # damp_pt (G-major)
    )
    out_specs = (
        pl.BlockSpec((1, w, k), lambda gg, j: (gg, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * np_cam, 1, tb, nb), lambda gg, j: (0, gg, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((6, 1, tb, nb), lambda gg, j: (0, gg, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 6, nb), lambda gg, j: (gg, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3, nb), lambda gg, j: (gg, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3, nb), lambda gg, j: (gg, 0, j),
                     memory_space=pltpu.VMEM),
    )
    rows, jc, jp, v_inv_g, g_pt_g, damp_g = pl.pallas_call(
        kernel,
        grid=(g, jb),
        in_specs=[
            pl.BlockSpec((1, 2), lambda gg, j: (0, 0),
                         memory_space=pltpu.SMEM),
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
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(
        scal,
        wcam.reshape(g, tb, pc).astype(jnp.int32),
        jnp.transpose(tw, (0, 2, 1)),  # (G, D, W)
        jnp.transpose(pts, (1, 0, 2)),  # (G, 3, Pc)
        uv,
        mask,
    )
    return (
        rows,
        jc,
        jp,
        jnp.transpose(v_inv_g, (1, 0, 2)),  # (6, G, Pc)
        jnp.transpose(g_pt_g, (1, 0, 2)),  # (3, G, Pc)
        jnp.transpose(damp_g, (1, 0, 2)),  # (3, G, Pc)
    )
