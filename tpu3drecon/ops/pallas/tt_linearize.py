"""Pallas kernels: fused track-table linearization.

The XLA tt linearization (solvers/ba_tt._linearize) round-trips ~120-165
scalar contribution planes through HBM per bucket: _tt_blocks writes
jc/jp/r (28 planes), the U/g/coupling products write another ~120, and the
one-hot reduce reads them all back.  At bench scale that transient traffic
is ~2 of the 5.3 ms/LM-iter (CLAUDE.md round-3 leads).  These kernels fuse
production and contraction:

  kernel A (``tt_cam_normal_fused``) — per (point-chunk, track-row) grid
  step: one MXU dot builds the per-slot camera planes from the parameter
  table and the one-hot TILE (never materializing the (19, slots) planes),
  the _tt_blocks formulas run in registers, the U-triangle + gradient
  products contract against the same one-hot tile on the MXU, and the
  point-side V/g accumulate over track rows.  Only jc/jp (needed later by
  the CG matvecs) and the tiny (cols, C) / (9, Pb) accumulators leave VMEM.

  kernel B (``tt_coupling_fused``) — second pass once v_inv is known
  (it needs the complete V): re-reads jc/jp, forms W v_inv W^T in
  registers, contracts against the one-hot.  Same structure as the grid
  engine's ops/pallas/coupling.py (which cut the precond build 8.6 ->
  0.6 ms in round 2).

The slot formulas and contribution lists are IMPORTED from solvers/ba_tt
(_tt_blocks, _u_g_contribs, _coupling_contribs) — one source of truth, so
the fused path is step-equivalent by construction (tests/test_ba_tt.py
asserts it numerically anyway).

No reference counterpart: the reference's BA materializes dense Jacobians
(src/reconstruction/bundle_adjustment/bundle_adjustment.py:83-91).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Lane-block width: contraction depth of the in-kernel MXU dots.  Pb is a
# multiple of the packer's point_block (default 512), so 512 always divides.
_NB = 512


def _expand_onehot(oh_raw, acc_t, nb: int):
    """One-hot tile to (C, nb) in ``acc_t``.

    Dense tiles (f32/bf16) just cast.  Bit-packed tiles (uint8, 8 slots per
    byte in bit-plane-within-tile order — tt_from_flat(onehot_dtype='bits'))
    expand in VMEM: the HBM stream is 1/16th of the bf16 form, and the
    expansion is VPU shift/mask work that never touches HBM.
    """
    if oh_raw.dtype == jnp.uint8:
        # Mosaic has no direct uint8 -> float cast (widen to int32 first)
        # and cannot shape-cast a minor-axis expansion, so the packer emits
        # bit-plane-within-tile order (problems/tt.py): plane j of the tile
        # is bit j of every byte, and lane-axis concatenation — which this
        # Mosaic version does lower — reassembles the (C, nb) tile.
        wide = oh_raw.astype(jnp.int32)
        planes = [((wide >> j) & 1).astype(acc_t) for j in range(8)]
        return jnp.concatenate(planes, axis=-1)
    return oh_raw.astype(acc_t)


def _onehot_spec(c: int, nb: int, packed: bool, index_map):
    width = nb // 8 if packed else nb
    return pl.BlockSpec((c, width), index_map, memory_space=pltpu.VMEM)


def _lane_block(pb: int, packed: bool, interpret: bool = False):
    """Lane-block width ``nb`` and grid extent ``jb`` for a bucket.

    Bit-packed one-hot tiles are (C, nb // 8) uint8 blocks; the Pallas TPU
    lowering requires the minor block dim to be divisible by 128, so packed
    mode needs nb = 1024 (128 uint8 lanes).  Dense tiles use _NB.  The
    constraint is a Mosaic lowering rule, so interpret mode (CPU emulation
    in tests) skips it.
    """
    if packed:
        # Must mirror the packer's tile choice (problems/tt.py bit_pack):
        # the bit-plane-within-tile format is only aligned when the kernel
        # lane block equals the pack-time tile.
        if pb % 1024 == 0:
            nb = 1024
        elif interpret:
            nb = pb
        else:
            raise ValueError(
                "bit-packed one-hots need a 1024-slot lane block (128 uint8 "
                f"lanes) but the bucket point padding {pb} is not a multiple "
                "of 1024; repack with tt_from_flat(point_block=1024) or use "
                "a dense onehot_dtype"
            )
    else:
        nb = min(_NB, pb)
    assert pb % nb == 0, (pb, nb)
    return nb, pb // nb


def _cam_kernel(
    table_ref,  # (C, 19) parameter table
    onehot_ref,  # (C, NB) one-hot tile (bf16 or f32)
    pts_ref,  # (3, NB)
    uv_ref,  # (2, NB)
    mask_ref,  # (1, NB)
    invw_ref,  # (1, 1) SMEM
    jc_ref,  # (2*np, NB) out
    jp_ref,  # (6, NB) out
    pt_acc_ref,  # (9, NB) out: v6 (6) + g_pt (3), accumulated over t
    cam_acc_ref,  # (cols, C) out: U triu + g, accumulated over everything
    *,
    config,
    np_cam: int,
    triu,
    nb: int,
):
    from tpu3drecon.solvers.ba_tt import _tt_blocks, _u_g_contribs

    t = pl.program_id(1)
    j = pl.program_id(0)
    acc_t = table_ref.dtype  # f32 compiled; f64 under interpret-mode tests
    oh = _expand_onehot(onehot_ref[:, :], acc_t, nb)  # (C, NB)

    # Per-slot camera parameter planes: one MXU dot replaces the HBM-wide
    # (19, slots) einsum of the XLA path.
    cp = jax.lax.dot_general(
        table_ref[:, :], oh,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=acc_t,
    )  # (19, NB)

    inv_w = invw_ref[0, 0]
    blocks = _tt_blocks(
        cp[:, None, :], pts_ref[:, :], uv_ref[:, :][:, None, :],
        mask_ref[:, :], inv_w, config,
    )
    jc = blocks.jc[:, 0, :]  # (2*np, NB)
    jp = blocks.jp[:, 0, :]
    r = blocks.r[:, 0, :]
    jc_ref[:, :] = jc
    jp_ref[:, :] = jp

    # Point-side partial sums (dense over the track axis = grid axis 1).
    v6 = jnp.stack(
        [
            jp[i] * jp[jx] + jp[3 + i] * jp[3 + jx]
            for (i, jx) in [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
        ]
    )
    g_pt = jnp.stack([jp[i] * r[0] + jp[3 + i] * r[1] for i in range(3)])
    pt_part = jnp.concatenate([v6, g_pt], axis=0)  # (9, NB)

    @pl.when(t == 0)
    def _():
        pt_acc_ref[:, :] = pt_part

    @pl.when(t != 0)
    def _():
        pt_acc_ref[:, :] = pt_acc_ref[:, :] + pt_part

    # Camera-side contraction: (cols, NB) x (C, NB) -> (cols, C) on the MXU.
    contribs = jnp.stack(_u_g_contribs(jc, r, np_cam, triu))
    part = jax.lax.dot_general(
        contribs, oh,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=acc_t,
    )

    @pl.when(jnp.logical_and(t == 0, j == 0))
    def _():
        cam_acc_ref[:, :] = part

    @pl.when(jnp.logical_or(t != 0, j != 0))
    def _():
        cam_acc_ref[:, :] = cam_acc_ref[:, :] + part


def _coupling_kernel(
    onehot_ref,  # (C, NB)
    jc_ref,  # (2*np, NB)
    jp_ref,  # (6, NB)
    vinv_ref,  # (6, NB) v_inv planes of the points in this chunk
    coup_acc_ref,  # (n_triu, C) out
    *,
    np_cam: int,
    triu,
    nb: int,
):
    from tpu3drecon.solvers.ba_tt import _coupling_contribs

    t = pl.program_id(1)
    j = pl.program_id(0)
    acc_t = jp_ref.dtype
    oh = _expand_onehot(onehot_ref[:, :], acc_t, nb)
    jc = jc_ref[:, :]
    jp = jp_ref[:, :]
    v = [vinv_ref[i, :] for i in range(6)]
    vi = [[v[0], v[1], v[2]], [v[1], v[3], v[4]], [v[2], v[4], v[5]]]
    contribs = jnp.stack(_coupling_contribs(jc, jp, vi, np_cam, triu))
    part = jax.lax.dot_general(
        contribs, oh,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=acc_t,
    )

    @pl.when(jnp.logical_and(t == 0, j == 0))
    def _():
        coup_acc_ref[:, :] = part

    @pl.when(jnp.logical_or(t != 0, j != 0))
    def _():
        coup_acc_ref[:, :] = coup_acc_ref[:, :] + part


@functools.partial(
    jax.jit,
    static_argnames=("config", "np_cam", "tb", "pb", "interpret"),
)
def tt_cam_normal_fused(
    table: jax.Array,  # (C, 19)
    onehot: jax.Array,  # (C, Tb*Pb) — flat slot axis
    pts: jax.Array,  # (3, Pb)
    uv: jax.Array,  # (2, Tb, Pb)
    mask: jax.Array,  # (Tb, Pb)
    inv_w: jax.Array,  # ()
    config,
    np_cam: int,
    tb: int,
    pb: int,
    interpret: bool = False,
):
    """Fused tt linearization, camera+point normal parts, one bucket.

    Returns (jc (2np, Tb, Pb), jp (6, Tb, Pb), v6 (6, Pb), g_pt (3, Pb),
    ug_cols (C, n_triu + np)).
    """
    from tpu3drecon.solvers.ba_tt import _triu_pairs

    c = table.shape[0]
    triu = tuple(_triu_pairs(np_cam))
    n_triu = len(triu)
    cols = n_triu + np_cam
    packed = onehot.dtype == jnp.uint8
    nb, jb = _lane_block(pb, packed, interpret)
    dtype = pts.dtype

    kernel = functools.partial(
        _cam_kernel, config=config, np_cam=np_cam, triu=triu, nb=nb
    )
    flat = lambda j, t: (0, t * jb + j)  # noqa: E731 — flat slot tile index
    jc, jp, pt_acc, cam_acc = pl.pallas_call(
        kernel,
        grid=(jb, tb),
        in_specs=[
            pl.BlockSpec((c, 19), lambda j, t: (0, 0), memory_space=pltpu.VMEM),
            _onehot_spec(c, nb, packed, flat),
            pl.BlockSpec((3, nb), lambda j, t: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, nb), flat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb), flat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda j, t: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((2 * np_cam, nb), flat, memory_space=pltpu.VMEM),
            pl.BlockSpec((6, nb), flat, memory_space=pltpu.VMEM),
            pl.BlockSpec((9, nb), lambda j, t: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((cols, c), lambda j, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2 * np_cam, tb * pb), dtype),
            jax.ShapeDtypeStruct((6, tb * pb), dtype),
            jax.ShapeDtypeStruct((9, pb), dtype),
            jax.ShapeDtypeStruct((cols, c), dtype),
        ],
        interpret=interpret,
    )(
        table,
        onehot,
        pts,
        uv.reshape(2, tb * pb),
        mask.reshape(1, tb * pb),
        inv_w.astype(dtype).reshape(1, 1),
    )
    return (
        jc.reshape(2 * np_cam, tb, pb),
        jp.reshape(6, tb, pb),
        pt_acc[:6],
        pt_acc[6:9],
        cam_acc.T,  # (C, cols)
    )


@functools.partial(
    jax.jit, static_argnames=("np_cam", "tb", "pb", "interpret")
)
def tt_coupling_fused(
    onehot: jax.Array,  # (C, Tb*Pb)
    jc: jax.Array,  # (2np, Tb, Pb)
    jp: jax.Array,  # (6, Tb, Pb)
    v_inv: jax.Array,  # (6, Pb)
    np_cam: int,
    tb: int,
    pb: int,
    interpret: bool = False,
):
    """Fused exact-S-diagonal coupling columns: (C, n_triu)."""
    from tpu3drecon.solvers.ba_tt import _triu_pairs

    c = onehot.shape[0]
    triu = tuple(_triu_pairs(np_cam))
    n_triu = len(triu)
    packed = onehot.dtype == jnp.uint8
    nb, jb = _lane_block(pb, packed, interpret)
    dtype = jp.dtype

    kernel = functools.partial(
        _coupling_kernel, np_cam=np_cam, triu=triu, nb=nb
    )
    flat = lambda j, t: (0, t * jb + j)  # noqa: E731
    coup = pl.pallas_call(
        kernel,
        grid=(jb, tb),
        in_specs=[
            _onehot_spec(c, nb, packed, flat),
            pl.BlockSpec((2 * np_cam, nb), flat, memory_space=pltpu.VMEM),
            pl.BlockSpec((6, nb), flat, memory_space=pltpu.VMEM),
            pl.BlockSpec((6, nb), lambda j, t: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (n_triu, c), lambda j, t: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_triu, c), dtype),
        interpret=interpret,
    )(
        onehot,
        jc.reshape(2 * np_cam, tb * pb),
        jp.reshape(6, tb * pb),
        v_inv,
    )
    return coup.T  # (C, n_triu)


def _wt_kernel(x_ref, onehot_ref, jc_ref, jp_ref, wtx_ref, *, np_cam, nb):
    """(W^T x) partial: xg via MXU dot, jp-weighted reduction over t."""
    t = pl.program_id(1)
    acc_t = x_ref.dtype
    oh = _expand_onehot(onehot_ref[:, :], acc_t, nb)
    xg = jax.lax.dot_general(
        x_ref[:, :], oh,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=acc_t,
    )  # (np, nb)
    jc = jc_ref[:, :]
    jp = jp_ref[:, :]
    s0 = sum(jc[i] * xg[i] for i in range(np_cam))
    s1 = sum(jc[np_cam + i] * xg[i] for i in range(np_cam))
    part = jnp.stack(
        [jp[l] * s0 + jp[3 + l] * s1 for l in range(3)]
    )  # (3, nb)

    @pl.when(t == 0)
    def _():
        wtx_ref[:, :] = part

    @pl.when(t != 0)
    def _():
        wtx_ref[:, :] = wtx_ref[:, :] + part


def _w_kernel(y_ref, onehot_ref, jc_ref, jp_ref, out_ref, *, np_cam, nb):
    """(W y) partial: slot planes then one-hot reduce to cameras."""
    t = pl.program_id(1)
    j = pl.program_id(0)
    acc_t = y_ref.dtype
    oh = _expand_onehot(onehot_ref[:, :], acc_t, nb)
    y = y_ref[:, :]  # (3, nb) point planes (same point cols for every t)
    jc = jc_ref[:, :]
    jp = jp_ref[:, :]
    s0 = jp[0] * y[0] + jp[1] * y[1] + jp[2] * y[2]
    s1 = jp[3] * y[0] + jp[4] * y[1] + jp[5] * y[2]
    z = jnp.stack(
        [jc[i] * s0 + jc[np_cam + i] * s1 for i in range(np_cam)]
    )  # (np, nb)
    part = jax.lax.dot_general(
        z, oh,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=acc_t,
    )  # (np, C)

    @pl.when(jnp.logical_and(t == 0, j == 0))
    def _():
        out_ref[:, :] = part

    @pl.when(jnp.logical_or(t != 0, j != 0))
    def _():
        out_ref[:, :] = out_ref[:, :] + part


def _cost_kernel(
    table_ref, onehot_ref, pts_ref, uv_ref, mask_ref, invw_ref, out_ref,
    *, config, nb,
):
    """Per-lane partial of the robust whitened cost (sum over t)."""
    from tpu3drecon.solvers.ba_tt import _tt_blocks

    t = pl.program_id(1)
    acc_t = table_ref.dtype
    oh = _expand_onehot(onehot_ref[:, :], acc_t, nb)
    cp = jax.lax.dot_general(
        table_ref[:, :], oh,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=acc_t,
    )
    blocks = _tt_blocks(
        cp[:, None, :], pts_ref[:, :], uv_ref[:, :][:, None, :],
        mask_ref[:, :], invw_ref[0, 0], config,
    )
    r = blocks.r[:, 0, :]  # whitened residual planes: cost = 0.5 sum r^2
    part = (r[0] * r[0] + r[1] * r[1])[None, :]

    @pl.when(t == 0)
    def _():
        out_ref[:, :] = part

    @pl.when(t != 0)
    def _():
        out_ref[:, :] = out_ref[:, :] + part




@functools.partial(
    jax.jit, static_argnames=("np_cam", "tb", "pb", "interpret")
)
def tt_wt_times_fused(
    x: jax.Array,  # (C, np)
    onehot: jax.Array,
    jc: jax.Array,  # (2np, Tb, Pb)
    jp: jax.Array,  # (6, Tb, Pb)
    np_cam: int,
    tb: int,
    pb: int,
    interpret: bool = False,
) -> jax.Array:
    """(W^T x) point planes (3, Pb) for one bucket, fused."""
    c = x.shape[0]
    packed = onehot.dtype == jnp.uint8
    nb, jb = _lane_block(pb, packed, interpret)
    dtype = x.dtype
    flat = lambda j, t: (0, t * jb + j)  # noqa: E731
    return pl.pallas_call(
        functools.partial(_wt_kernel, np_cam=np_cam, nb=nb),
        grid=(jb, tb),
        in_specs=[
            pl.BlockSpec((c, np_cam), lambda j, t: (0, 0), memory_space=pltpu.VMEM),
            _onehot_spec(c, nb, packed, flat),
            pl.BlockSpec((2 * np_cam, nb), flat, memory_space=pltpu.VMEM),
            pl.BlockSpec((6, nb), flat, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, nb), lambda j, t: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, pb), dtype),
        interpret=interpret,
    )(
        x,
        onehot,
        jc.reshape(2 * np_cam, tb * pb),
        jp.reshape(6, tb * pb),
    )


@functools.partial(
    jax.jit, static_argnames=("np_cam", "tb", "pb", "interpret")
)
def tt_w_times_fused(
    y: jax.Array,  # (3, Pb) point planes
    onehot: jax.Array,
    jc: jax.Array,  # (2np, Tb, Pb)
    jp: jax.Array,  # (6, Tb, Pb)
    np_cam: int,
    tb: int,
    pb: int,
    interpret: bool = False,
) -> jax.Array:
    """(W y) camera rows (C, np) for one bucket, fused."""
    c = onehot.shape[0]
    packed = onehot.dtype == jnp.uint8
    nb, jb = _lane_block(pb, packed, interpret)
    dtype = y.dtype
    flat = lambda j, t: (0, t * jb + j)  # noqa: E731
    out = pl.pallas_call(
        functools.partial(_w_kernel, np_cam=np_cam, nb=nb),
        grid=(jb, tb),
        in_specs=[
            pl.BlockSpec((3, nb), lambda j, t: (0, j), memory_space=pltpu.VMEM),
            _onehot_spec(c, nb, packed, flat),
            pl.BlockSpec((2 * np_cam, nb), flat, memory_space=pltpu.VMEM),
            pl.BlockSpec((6, nb), flat, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (np_cam, c), lambda j, t: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((np_cam, c), dtype),
        interpret=interpret,
    )(y, onehot, jc.reshape(2 * np_cam, tb * pb), jp.reshape(6, tb * pb))
    return out.T


@functools.partial(
    jax.jit, static_argnames=("config", "tb", "pb", "interpret")
)
def tt_cost_fused(
    table: jax.Array,  # (C, 19)
    onehot: jax.Array,
    pts: jax.Array,  # (3, Pb)
    uv: jax.Array,  # (2, Tb, Pb)
    mask: jax.Array,  # (Tb, Pb)
    inv_w: jax.Array,  # ()
    config,
    tb: int,
    pb: int,
    interpret: bool = False,
) -> jax.Array:
    """0.5 * sum(whitened r^2) for one bucket, fused (returns a scalar)."""
    c = table.shape[0]
    packed = onehot.dtype == jnp.uint8
    nb, jb = _lane_block(pb, packed, interpret)
    dtype = pts.dtype
    flat = lambda j, t: (0, t * jb + j)  # noqa: E731
    lane = pl.pallas_call(
        functools.partial(_cost_kernel, config=config, nb=nb),
        grid=(jb, tb),
        in_specs=[
            pl.BlockSpec((c, 19), lambda j, t: (0, 0), memory_space=pltpu.VMEM),
            _onehot_spec(c, nb, packed, flat),
            pl.BlockSpec((3, nb), lambda j, t: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, nb), flat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb), flat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda j, t: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, nb), lambda j, t: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, pb), dtype),
        interpret=interpret,
    )(
        table,
        onehot,
        pts,
        uv.reshape(2, tb * pb),
        mask.reshape(1, tb * pb),
        inv_w.astype(dtype).reshape(1, 1),
    )
    return 0.5 * jnp.sum(lane)
