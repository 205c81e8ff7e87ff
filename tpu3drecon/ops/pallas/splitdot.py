"""Exact bf16-split one-hot dots, with the split terms STACKED into one dot.

The index kernels select/reduce through {0,1} one-hot tiles rebuilt in
VMEM.  Mosaic's HIGHEST-precision f32 dots cost 6 MXU passes, so the
kernels instead split the f32 data operand into ``terms`` bf16 pieces
(8 mantissa bits each) and accumulate DEFAULT-precision partials in
f32 — every partial product bf16_term x {0,1} is exact, so terms=3
reconstructs the f32 value exactly (RESULTS.md round 4b).

Round-5 measurement (experiments/tpu_term_stack.py, real TPU,
BAL-representative shapes): running the three term passes as three
SEPARATE dots wastes the MXU — the data operand is only np=8 (matvec)
to D=19 (selects) wide, so each pass occupies a sliver of the 128-lane
array and costs a full tile sweep anyway.  CONCATENATING the split
terms along the data operand's non-contracted axis into ONE dot
(3 x (8, W) @ (W, NB)  ->  (24, W) @ (W, NB), fold the three row
groups after) cut the coupling kernel 0.434 -> 0.245 ms/call (1.77x)
with max relative difference 8e-8 = f32 rounding (the wider dot may
re-associate the contraction, so results are f32-FAITHFUL but not
bit-identical to the separate-pass form).

``terms == 0`` or f64 data take one exact HIGHEST dot (the CPU test
mesh; real TPUs do not run f64).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def split_terms(x, acc_t, terms, axis=0):
    """Split f32 ``x`` into ``terms`` bf16 pieces concatenated on ``axis``.

    Sum of the pieces (in f32) telescopes back to x up to the final
    piece's truncation; with terms=3 the reconstruction is exact for f32
    inputs (3 x 8 mantissa bits >= 24)."""
    hs = []
    rem = x
    for _ in range(terms):
        h = rem.astype(jnp.bfloat16)
        rem = rem - h.astype(acc_t)
        hs.append(h)
    return jnp.concatenate(hs, axis=axis)


def _fold(out, m, terms, axis):
    """Sum the ``terms`` stacked groups of size ``m`` along ``axis`` in
    the same (t1 + t2) + t3 order as sequential per-term accumulation."""
    sl = [slice(None)] * out.ndim
    sl[axis] = slice(0, m)
    acc = out[tuple(sl)]
    for i in range(1, terms):
        sl[axis] = slice(i * m, (i + 1) * m)
        acc = acc + out[tuple(sl)]
    return acc


def stacked_split_lhs(x, oh_bf, acc_t, terms, transpose_oh):
    """dot(x (M, K) f32, one-hot (K, N) | (N, K) bf16) -> (M, N).

    Exact at terms=3; the bf16 split terms ride ONE dot stacked along M
    (see module docstring).  ``transpose_oh``: contract oh's axis 1
    instead of axis 0."""
    dims = ((((1,), (1,)) if transpose_oh else ((1,), (0,))), ((), ()))
    if acc_t == jnp.float64 or terms == 0:
        return jax.lax.dot_general(
            x, oh_bf.astype(acc_t), dimension_numbers=dims,
            preferred_element_type=acc_t,
            precision=jax.lax.Precision.HIGHEST,
        )
    out = jax.lax.dot_general(
        split_terms(x, acc_t, terms, axis=0), oh_bf,
        dimension_numbers=dims,
        preferred_element_type=acc_t,
        precision=jax.lax.Precision.DEFAULT,
    )
    return _fold(out, x.shape[0], terms, axis=0)


def stacked_split_rhs(oh_bf, data, acc_t, terms, stack=True):
    """dot(one-hot (W, NB) bf16, data (K, NB) f32) -> (W, K) reduction.

    Contraction over NB (both operands' axis 1); the data split terms
    stack along K, folded from the output's columns.

    ``stack=False`` keeps the sequential per-term accumulation instead:
    the stacked form materializes a (W, terms*K) pre-fold output that
    Mosaic's stack allocator retains PER UNROLLED caller iteration —
    at the hub layout's global window (W=1664, K=88, Tb=12) that is
    ~21 MB of scoped VMEM, independent of the block size, and the
    kernel aborts compilation (measured round 5).  Sequential partials
    are freed as they accumulate.  Values identical up to f32
    re-association; both are exact at terms=3."""
    dims = (((1,), (1,)), ((), ()))
    if acc_t == jnp.float64 or terms == 0:
        return jax.lax.dot_general(
            oh_bf.astype(acc_t), data, dimension_numbers=dims,
            preferred_element_type=acc_t,
            precision=jax.lax.Precision.HIGHEST,
        )
    if not stack:
        acc = None
        rem = data
        for _ in range(terms):
            h = rem.astype(jnp.bfloat16)
            rem = rem - h.astype(acc_t)
            part = jax.lax.dot_general(
                oh_bf, h, dimension_numbers=dims,
                preferred_element_type=acc_t,
                precision=jax.lax.Precision.DEFAULT,
            )
            acc = part if acc is None else acc + part
        return acc
    out = jax.lax.dot_general(
        oh_bf, split_terms(data, acc_t, terms, axis=0),
        dimension_numbers=dims,
        preferred_element_type=acc_t,
        precision=jax.lax.Precision.DEFAULT,
    )
    return _fold(out, data.shape[0], terms, axis=1)
