"""Pallas kernel: single-pass Schur-complement coupling matvec (wtt).

The XLA wtt PCG matvec streams each bucket's one-hot tensor TWICE per
CG iteration — once for the (W^T x) window contraction and once for the
(W y) camera reduction — plus two reads of jc/jp.  At BAL scale that is
~4.9 GB per CG iteration (2.09 GB bf16 one-hots + 0.4 GB jc/jp, twice),
the dominant share of the 0.128 s/LM-iter solve (8 CG iterations).

This kernel computes the WHOLE coupling product W V^-1 W^T x for one
bucket in a single pass: per (group, point-block) grid step the one-hot
tile is DMA'd into VMEM once and used by BOTH phases —

  phase 1 (per track row t): xg = xw @ oh_t on the MXU, the jc/jp
  weighted reduction accumulates (W^T x) over t;
  y = v_inv (sym3) @ wtx in registers;
  phase 2 (same VMEM tiles): z_t = jc * (jp y), rows += z_t @ oh_t^T.

HBM traffic per matvec: one-hot + jc + jp read ONCE (the fused-full tt
path kept two passes in separate kernels, which is why it measured
slower than XLA — same stream count plus kernel overhead).

Values are step-equivalent to solvers/ba_wtt._wt_times_bucket_w /
_w_times_bucket_w (asserted in tests/test_ba_wtt.py); f32 accumulation
order differs (sum-over-t interleaving), which is within the engines'
documented f32 trajectory variance.

No reference counterpart: the reference materializes dense Jacobians
(src/reconstruction/bundle_adjustment/bundle_adjustment.py:83-91).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NB = 512


def _matvec_kernel(
    xw_ref,  # (1, np, W) window rows of x for this group
    oh_ref,  # (1, W, Tb, NB) one-hot tile (bf16/f32)
    jc_ref,  # (2*np, 1, Tb, NB)
    jp_ref,  # (6, 1, Tb, NB)
    vinv_ref,  # (1, 6, NB) — group-major so the block's last-two dims
    #            are (6 = full, NB); Mosaic rejects a middle dim of 1
    out_ref,  # (1, np, W) coupling rows, accumulated over j
    *,
    np_cam: int,
    tb: int,
):
    j = pl.program_id(1)
    acc_t = xw_ref.dtype
    xw = xw_ref[0]  # (np, W)

    # Phase 1: (W^T x) accumulated over track rows.
    wtx = [None, None, None]
    oh_tiles = []
    jc0_tiles = []
    jc1_tiles = []
    jp_tiles = []
    for t in range(tb):
        oh = oh_ref[0, :, t, :].astype(acc_t)  # (W, NB)
        oh_tiles.append(oh)
        xg = jax.lax.dot_general(
            xw, oh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=acc_t,
        )  # (np, NB)
        jc0 = jc_ref[:np_cam, 0, t, :]
        jc1 = jc_ref[np_cam:, 0, t, :]
        jc0_tiles.append(jc0)
        jc1_tiles.append(jc1)
        s0 = jnp.sum(jc0 * xg, axis=0)  # (NB,)
        s1 = jnp.sum(jc1 * xg, axis=0)
        jp_t = jp_ref[:, 0, t, :]  # (6, NB)
        jp_tiles.append(jp_t)
        for l in range(3):
            part = jp_t[l] * s0 + jp_t[3 + l] * s1
            wtx[l] = part if wtx[l] is None else wtx[l] + part

    # y = v_inv (sym3 plane form) @ wtx.
    v = vinv_ref[0]  # (6, NB)
    y0 = v[0] * wtx[0] + v[1] * wtx[1] + v[2] * wtx[2]
    y1 = v[1] * wtx[0] + v[3] * wtx[1] + v[4] * wtx[2]
    y2 = v[2] * wtx[0] + v[4] * wtx[1] + v[5] * wtx[2]

    # Phase 2: (W y) rows from the SAME VMEM tiles.
    acc = None
    for t in range(tb):
        jp_t = jp_tiles[t]
        s0p = jp_t[0] * y0 + jp_t[1] * y1 + jp_t[2] * y2
        s1p = jp_t[3] * y0 + jp_t[4] * y1 + jp_t[5] * y2
        z = jc0_tiles[t] * s0p[None] + jc1_tiles[t] * s1p[None]  # (np, NB)
        part = jax.lax.dot_general(
            z, oh_tiles[t],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=acc_t,
        )  # (np, W)
        acc = part if acc is None else acc + part

    @pl.when(j == 0)
    def _():
        out_ref[0] = acc

    @pl.when(j != 0)
    def _():
        out_ref[0] = out_ref[0] + acc


def _matvec_kernel_idx(
    xw_ref,  # (1, np, W) window rows of x for this group
    wcam_ref,  # (1, tb, NB) int32 window-relative camera index (-1 = pad)
    jc_ref,  # (2*np, 1, Tb, NB)
    jp_ref,  # (6, 1, Tb, NB)
    vinv_ref,  # (1, 6, NB)
    out_ref,  # (1, np, W) coupling rows, accumulated over j
    *,
    np_cam: int,
    tb: int,
    window: int,
    terms: int,
):
    """Index-encoded variant of ``_matvec_kernel``: the one-hot tile is
    REBUILT in VMEM from the 4-byte-per-slot window index (iota-compare)
    instead of streamed from HBM, and the selection dots run as ``terms``
    DEFAULT-precision bf16 passes of a split f32 operand.

    Why both tricks (measured, experiments/tpu_index_matvec{,2,3}.py at
    BAL scale): the dense-one-hot DMA is 2 GB/matvec, but deleting it
    alone ties XLA (8.0 vs 7.6 ms) because Mosaic's HIGHEST-precision
    dots cost 6 MXU passes (~1.3 ms each here).  The one-hot is exactly
    representable in bf16 ({0,1}), so splitting ONLY the f32 operand into
    ``terms`` bf16 pieces (8 mantissa bits each) and accumulating the
    DEFAULT-precision partials in f32 is f32-faithful at terms=3: each
    partial product bf16_term x {0,1} is exact.  Measured: terms=3
    3.93 ms/matvec with max-rel-diff vs the XLA path 2.3e-7 — IDENTICAL
    to the HIGHEST kernel's accumulation-order noise; terms=1 (plain
    bf16 operand) 1.68 ms at 2.3e-3.  The XLA-level version of this
    split is impossible (the bf16 propagation pass demotes the remainder
    chain — experiments/tpu_selection_dot2.py); inside Mosaic the split
    compiles as written.

    Padding slots carry index -1, which matches no iota row: exact-zero
    one-hot columns, the same invariant as problems.wtt._expand_wcam.
    """
    from tpu3drecon.ops.pallas.splitdot import stacked_split_lhs

    j = pl.program_id(1)
    acc_t = xw_ref.dtype
    xw = xw_ref[0]  # (np, W)
    nb = wcam_ref.shape[2]
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (window, nb), 0)

    def split_dot(x, oh_bf, transpose_oh):
        """dot(x f32, one-hot bf16): ``terms`` bf16 split pieces STACKED
        into one MXU dot (splitdot.py — measured 1.77x over separate
        term passes; the np-wide operands use a sliver of the 128-lane
        array, so each separate pass cost a full tile sweep).  f64 (the
        CPU test mesh) takes one exact HIGHEST dot."""
        return stacked_split_lhs(x, oh_bf, acc_t, terms, transpose_oh)

    def oh_t(t):
        idx = wcam_ref[0, t, :]  # (NB,) int32
        return (w_iota == idx[None, :]).astype(jnp.bfloat16)  # (W, NB)

    # Phase 1: (W^T x) accumulated over track rows.  One-hot tiles and
    # jc/jp loads are NOT kept across track rows or phases: rebuilding
    # them is free (interleaved A/B, experiments/tpu_index_matvec2.py
    # keep=True vs False identical) while keeping tb tiles live blows the
    # 16 MB VMEM stack at hub windows (tb=12, window=1664 = 20.9 MB).
    wtx = [None, None, None]
    for t in range(tb):
        xg = split_dot(xw, oh_t(t), transpose_oh=False)  # (np, NB)
        s0 = jnp.sum(jc_ref[:np_cam, 0, t, :] * xg, axis=0)  # (NB,)
        s1 = jnp.sum(jc_ref[np_cam:, 0, t, :] * xg, axis=0)
        jp_t = jp_ref[:, 0, t, :]  # (6, NB)
        for l in range(3):
            part = jp_t[l] * s0 + jp_t[3 + l] * s1
            wtx[l] = part if wtx[l] is None else wtx[l] + part

    # y = v_inv (sym3 plane form) @ wtx.
    v = vinv_ref[0]  # (6, NB)
    y0 = v[0] * wtx[0] + v[1] * wtx[1] + v[2] * wtx[2]
    y1 = v[1] * wtx[0] + v[3] * wtx[1] + v[4] * wtx[2]
    y2 = v[2] * wtx[0] + v[4] * wtx[1] + v[5] * wtx[2]

    # Phase 2: (W y) rows, rebuilding each one-hot tile.
    acc = None
    for t in range(tb):
        jp_t = jp_ref[:, 0, t, :]
        s0p = jp_t[0] * y0 + jp_t[1] * y1 + jp_t[2] * y2
        s1p = jp_t[3] * y0 + jp_t[4] * y1 + jp_t[5] * y2
        z = (jc_ref[:np_cam, 0, t, :] * s0p[None]
             + jc_ref[np_cam:, 0, t, :] * s1p[None])  # (np, NB)
        part = split_dot(z, oh_t(t), transpose_oh=True)  # (np, W)
        acc = part if acc is None else acc + part

    @pl.when(j == 0)
    def _():
        out_ref[0] = acc

    @pl.when(j != 0)
    def _():
        out_ref[0] = out_ref[0] + acc


@functools.partial(
    jax.jit,
    static_argnames=("np_cam", "tb", "pc", "window", "terms", "interpret"),
)
def wtt_coupling_rows_idx(
    xw_t: jax.Array,  # (G, np, W) transposed window rows of x_pad
    wcam: jax.Array,  # (G, Tb*Pc) integer window index per slot (-1 = pad)
    jc: jax.Array,  # (2np, G, Tb, Pc)
    jp: jax.Array,  # (6, G, Tb, Pc)
    v_inv: jax.Array,  # (6, G, Pc)
    np_cam: int,
    tb: int,
    pc: int,
    window: int,
    terms: int = 3,
    interpret: bool = False,
) -> jax.Array:
    """Coupling rows (G, np, W) from the INDEX-encoded one-hot (wcam).

    ``terms``: bf16 split passes per dot — 3 is f32-faithful (default),
    1 is the fast single-pass mode (~2.3e-3 operator perturbation; CG is
    run inexact anyway but trajectories will differ from the XLA path).
    """
    g = wcam.shape[0]
    w = window
    dtype = xw_t.dtype
    # Largest 128-multiple block dividing Pc, capped at the measured-best
    # 896 (experiments/tpu_index_matvec2.py; 1792 blew the VMEM stack) AND
    # at a VMEM budget model: per-nb live bytes = double-buffered input
    # blocks (wcam/jc/jp/v_inv) + one rebuilt bf16 one-hot tile (x2
    # in-flight safety) + the xg/z/split temporaries; ~10 MB of the 16 MB
    # stack keeps wide hub windows (window 1664, tb 12) compiling.
    itemsize = jnp.dtype(dtype).itemsize
    per_nb = (
        2 * (4 * tb + 2 * itemsize * np_cam * tb + 6 * itemsize * tb
             + 6 * itemsize)
        # Mosaic's stack allocator retains every unrolled track row's bf16
        # one-hot tile (measured: the hub bucket window=1664/tb=12 asks
        # for exactly tb tiles regardless of value liveness), so budget
        # all tb of them, twice (both phases' unrolled chains).
        + 2 * 2 * w * tb
        + 8 * itemsize * np_cam
    )
    nb_budget = max(128, int(10_000_000 // max(per_nb, 1)) // 128 * 128)
    nb = next(
        (k for k in range(min(896, nb_budget, pc), 127, -128)
         if pc % k == 0 and k % 128 == 0),
        pc,
    )
    if not interpret and pc % 128 != 0:
        raise ValueError(
            f"wtt matvec kernel needs point-chunk padding divisible by "
            f"128 on TPU (got Pc={pc}); repack with point_chunk>=128"
        )
    jb = pc // nb

    kernel = functools.partial(
        _matvec_kernel_idx, np_cam=np_cam, tb=tb, window=w, terms=terms
    )
    rows = pl.pallas_call(
        kernel,
        grid=(g, jb),
        in_specs=[
            pl.BlockSpec((1, np_cam, w), lambda gg, j: (gg, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb, nb), lambda gg, j: (gg, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * np_cam, 1, tb, nb), lambda gg, j: (0, gg, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, 1, tb, nb), lambda gg, j: (0, gg, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 6, nb), lambda gg, j: (gg, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, np_cam, w), lambda gg, j: (gg, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, np_cam, w), dtype),
        interpret=interpret,
    )(
        xw_t,
        wcam.reshape(g, tb, pc).astype(jnp.int32),
        jc,
        jp,
        jnp.transpose(v_inv, (1, 0, 2)),  # (G, 6, Pc)
    )
    return rows


def _wt_kernel_idx(
    xw_ref,  # (1, np, W) window rows of x for this group
    wcam_ref,  # (1, tb, NB) int32 window-relative camera index (-1 = pad)
    jc_ref,  # (2*np, 1, Tb, NB)
    jp_ref,  # (6, 1, Tb, NB)
    out_ref,  # (1, 3, NB) W^T x point planes
    *,
    np_cam: int,
    tb: int,
    window: int,
    terms: int,
):
    """Phase 1 of ``_matvec_kernel_idx`` standalone: (W^T x) point planes
    from index-rebuilt one-hots — the back-substitution's product
    (ba_wtt._wt_times_bucket_w) without the ~1 GB dense one-hot read."""
    from tpu3drecon.ops.pallas.splitdot import stacked_split_lhs

    acc_t = xw_ref.dtype
    xw = xw_ref[0]
    nb = wcam_ref.shape[2]
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (window, nb), 0)

    def split_dot(x, oh_bf):
        # terms stacked into one MXU dot (splitdot.py, measured 1.77x).
        return stacked_split_lhs(x, oh_bf, acc_t, terms, transpose_oh=False)

    wtx = [None, None, None]
    for t in range(tb):
        idx = wcam_ref[0, t, :]
        oh = (w_iota == idx[None, :]).astype(jnp.bfloat16)
        xg = split_dot(xw, oh)  # (np, NB)
        s0 = jnp.sum(jc_ref[:np_cam, 0, t, :] * xg, axis=0)
        s1 = jnp.sum(jc_ref[np_cam:, 0, t, :] * xg, axis=0)
        jp_t = jp_ref[:, 0, t, :]
        for l in range(3):
            part = jp_t[l] * s0 + jp_t[3 + l] * s1
            wtx[l] = part if wtx[l] is None else wtx[l] + part
    for l in range(3):
        out_ref[0, l, :] = wtx[l]


def _w_kernel_idx(
    y_ref,  # (1, 3, NB) point planes y
    wcam_ref,  # (1, tb, NB) int32 window-relative camera index (-1 = pad)
    jc_ref,  # (2*np, 1, Tb, NB)
    jp_ref,  # (6, 1, Tb, NB)
    out_ref,  # (1, np, W) W y rows, accumulated over j
    *,
    np_cam: int,
    tb: int,
    window: int,
    terms: int,
):
    """Phase 2 of ``_matvec_kernel_idx`` standalone: (W y) camera rows
    from index-rebuilt one-hots — the rhs product
    (ba_wtt._w_times_bucket_w) without the dense one-hot read."""
    from tpu3drecon.ops.pallas.splitdot import stacked_split_lhs

    j = pl.program_id(1)
    acc_t = y_ref.dtype
    nb = wcam_ref.shape[2]
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (window, nb), 0)

    def split_dot(x, oh_bf):
        # terms stacked into one MXU dot (splitdot.py, measured 1.77x).
        return stacked_split_lhs(x, oh_bf, acc_t, terms, transpose_oh=True)

    y0 = y_ref[0, 0, :]
    y1 = y_ref[0, 1, :]
    y2 = y_ref[0, 2, :]
    acc = None
    for t in range(tb):
        idx = wcam_ref[0, t, :]
        oh = (w_iota == idx[None, :]).astype(jnp.bfloat16)
        jp_t = jp_ref[:, 0, t, :]
        s0p = jp_t[0] * y0 + jp_t[1] * y1 + jp_t[2] * y2
        s1p = jp_t[3] * y0 + jp_t[4] * y1 + jp_t[5] * y2
        z = (jc_ref[:np_cam, 0, t, :] * s0p[None]
             + jc_ref[np_cam:, 0, t, :] * s1p[None])  # (np, NB)
        part = split_dot(z, oh)  # (np, W)
        acc = part if acc is None else acc + part

    @pl.when(j == 0)
    def _():
        out_ref[0] = acc

    @pl.when(j != 0)
    def _():
        out_ref[0] = out_ref[0] + acc


def _idx_block(pc: int, per_nb: int) -> int:
    """Largest 128-multiple point block dividing Pc under the shared
    ~10 MB VMEM stack budget (see ``wtt_coupling_rows_idx``)."""
    nb_budget = max(128, int(10_000_000 // max(per_nb, 1)) // 128 * 128)
    return next(
        (k for k in range(min(896, nb_budget, pc), 127, -128)
         if pc % k == 0 and k % 128 == 0),
        pc,
    )


@functools.partial(
    jax.jit,
    static_argnames=("np_cam", "tb", "pc", "window", "terms", "interpret"),
)
def wtt_wt_planes_idx(
    xw_t: jax.Array,  # (G, np, W) transposed window rows of x_pad
    wcam: jax.Array,  # (G, Tb*Pc)
    jc: jax.Array,  # (2np, G, Tb, Pc)
    jp: jax.Array,  # (6, G, Tb, Pc)
    np_cam: int,
    tb: int,
    pc: int,
    window: int,
    terms: int = 3,
    interpret: bool = False,
) -> jax.Array:
    """(W^T x) point planes (3, G, Pc) from the index-encoded one-hot."""
    g = wcam.shape[0]
    w = window
    dtype = xw_t.dtype
    if not interpret and pc % 128 != 0:
        raise ValueError(
            f"wtt W^T kernel needs point-chunk padding divisible by 128 "
            f"on TPU (got Pc={pc}); repack with point_chunk>=128"
        )
    itemsize = jnp.dtype(dtype).itemsize
    per_nb = (
        2 * (4 * tb + (2 * np_cam + 6) * itemsize * tb)
        + tb * (2 * w + (np_cam + 4) * itemsize)
    )
    nb = _idx_block(pc, per_nb)
    kernel = functools.partial(
        _wt_kernel_idx, np_cam=np_cam, tb=tb, window=w, terms=terms
    )
    out = pl.pallas_call(
        kernel,
        grid=(g, pc // nb),
        in_specs=[
            pl.BlockSpec((1, np_cam, w), lambda gg, j: (gg, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb, nb), lambda gg, j: (gg, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * np_cam, 1, tb, nb), lambda gg, j: (0, gg, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, 1, tb, nb), lambda gg, j: (0, gg, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, nb), lambda gg, j: (gg, 0, j),
                               memory_space=pltpu.VMEM),
        # (G, 3, Pc) layout: Mosaic needs the last-two block dims full or
        # 8/128-divisible — (1, 3, nb) with 3 = full middle dim qualifies,
        # (3, 1, nb) does not.
        out_shape=jax.ShapeDtypeStruct((g, 3, pc), dtype),
        interpret=interpret,
    )(
        xw_t,
        wcam.reshape(g, tb, pc).astype(jnp.int32),
        jc,
        jp,
    )
    return jnp.transpose(out, (1, 0, 2))


@functools.partial(
    jax.jit,
    static_argnames=("np_cam", "tb", "pc", "window", "terms", "interpret"),
)
def wtt_w_rows_idx(
    y: jax.Array,  # (3, G, Pc) point planes
    wcam: jax.Array,  # (G, Tb*Pc)
    jc: jax.Array,  # (2np, G, Tb, Pc)
    jp: jax.Array,  # (6, G, Tb, Pc)
    np_cam: int,
    tb: int,
    pc: int,
    window: int,
    terms: int = 3,
    interpret: bool = False,
) -> jax.Array:
    """(W y) camera rows (G, np, W) from the index-encoded one-hot."""
    g = wcam.shape[0]
    w = window
    dtype = y.dtype
    if not interpret and pc % 128 != 0:
        raise ValueError(
            f"wtt W kernel needs point-chunk padding divisible by 128 "
            f"on TPU (got Pc={pc}); repack with point_chunk>=128"
        )
    itemsize = jnp.dtype(dtype).itemsize
    per_nb = (
        2 * (4 * tb + (2 * np_cam + 6) * itemsize * tb + 3 * itemsize)
        + tb * (2 * w + (np_cam + 4) * itemsize)
    )
    nb = _idx_block(pc, per_nb)
    kernel = functools.partial(
        _w_kernel_idx, np_cam=np_cam, tb=tb, window=w, terms=terms
    )
    return pl.pallas_call(
        kernel,
        grid=(g, pc // nb),
        in_specs=[
            pl.BlockSpec((1, 3, nb), lambda gg, j: (gg, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb, nb), lambda gg, j: (gg, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * np_cam, 1, tb, nb), lambda gg, j: (0, gg, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, 1, tb, nb), lambda gg, j: (0, gg, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, np_cam, w), lambda gg, j: (gg, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, np_cam, w), dtype),
        interpret=interpret,
    )(
        jnp.transpose(y, (1, 0, 2)),  # (G, 3, Pc) — see wt_planes note
        wcam.reshape(g, tb, pc).astype(jnp.int32),
        jc,
        jp,
    )


@functools.partial(
    jax.jit, static_argnames=("np_cam", "tb", "pc", "window", "interpret")
)
def wtt_coupling_rows_fused(
    xw_t: jax.Array,  # (G, np, W) transposed window rows of x_pad
    onehot: jax.Array,  # (G, W, Tb*Pc)
    jc: jax.Array,  # (2np, G, Tb, Pc)
    jp: jax.Array,  # (6, G, Tb, Pc)
    v_inv: jax.Array,  # (6, G, Pc)
    np_cam: int,
    tb: int,
    pc: int,
    window: int,
    interpret: bool = False,
) -> jax.Array:
    """Coupling rows (G, np, W) = per-group windowed W V^-1 W^T x."""
    g = onehot.shape[0]
    w = window
    dtype = xw_t.dtype
    if pc % _NB == 0:
        nb = _NB
    else:
        if not interpret and pc % 128 != 0:
            raise ValueError(
                f"wtt matvec kernel needs point-chunk padding divisible by "
                f"128 on TPU (got Pc={pc}); repack with point_chunk>=128"
            )
        nb = pc
    jb = pc // nb

    kernel = functools.partial(_matvec_kernel, np_cam=np_cam, tb=tb)
    rows = pl.pallas_call(
        kernel,
        grid=(g, jb),
        in_specs=[
            pl.BlockSpec((1, np_cam, w), lambda gg, j: (gg, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, tb, nb), lambda gg, j: (gg, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * np_cam, 1, tb, nb), lambda gg, j: (0, gg, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, 1, tb, nb), lambda gg, j: (0, gg, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 6, nb), lambda gg, j: (gg, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, np_cam, w), lambda gg, j: (gg, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, np_cam, w), dtype),
        interpret=interpret,
    )(
        xw_t,
        onehot.reshape(g, w, tb, pc),
        jc,
        jp,
        jnp.transpose(v_inv, (1, 0, 2)),  # (G, 6, Pc)
    )
    return rows
