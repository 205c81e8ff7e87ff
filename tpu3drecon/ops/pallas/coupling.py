"""Pallas kernel: fused SCHUR_JACOBI coupling blocks.

Per camera row, computes the point-elimination fill of the exact-S-diagonal
preconditioner

    coupling_c = sum_k W_ck  Vinv_p(c,k)  W_ck^T,     W_ck = jc_ck^T jp_ck

in one VMEM pass over the K lane axis.  The XLA formulation materializes the
(C, K, 8, 3) W tensor and a (C, K, 3, 3) gathered Vinv (measured ~6.5 ms per
linearization on the medium bench — most of the preconditioner's cost); here
every intermediate stays in vector registers and only the (C, 8, 8) output
leaves the kernel.

Inputs are component-major planes like ops/pallas/cam_normal.py; Vinv rides
as its 6 unique (symmetric) planes gathered by pt_idx on the XLA side —
gathers cost per ROW, not per element (RESULTS.md round-2 rate model), so the
6-wide rows are no dearer than scalars.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _coupling_kernel(jc_ref, jp_ref, vinv_ref, out_ref):
    # Whitened jacobian planes (rows 0..7 = residual row 0, 8..15 = row 1).
    jc0 = [jc_ref[0, i, :] for i in range(8)]
    jc1 = [jc_ref[0, 8 + i, :] for i in range(8)]
    jp0 = [jp_ref[0, j, :] for j in range(3)]
    jp1 = [jp_ref[0, 3 + j, :] for j in range(3)]
    v00 = vinv_ref[0, 0, :]
    v01 = vinv_ref[0, 1, :]
    v02 = vinv_ref[0, 2, :]
    v11 = vinv_ref[0, 3, :]
    v12 = vinv_ref[0, 4, :]
    v22 = vinv_ref[0, 5, :]
    vrows = ((v00, v01, v02), (v01, v11, v12), (v02, v12, v22))

    # W[i][j] = jc^T jp per lane (24 planes, registers only).
    w = [[jc0[i] * jp0[j] + jc1[i] * jp1[j] for j in range(3)] for i in range(8)]
    # T[i][l] = sum_j W[i][j] vinv[j][l].
    t = [
        [sum(w[i][j] * vrows[j][l] for j in range(3)) for l in range(3)]
        for i in range(8)
    ]
    # out[i][m] = sum_lanes sum_l T[i][l] W[m][l]  (symmetric).
    vals = {}
    for i in range(8):
        for m in range(i, 8):
            vals[(i, m)] = jnp.sum(sum(t[i][l] * w[m][l] for l in range(3)))
    out_ref[0, :, :] = jnp.stack(
        [
            jnp.stack([vals[(min(i, m), max(i, m))] for m in range(8)])
            for i in range(8)
        ]
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def coupling_fused(
    jc: jax.Array,  # (C, 16, K) whitened camera-Jacobian planes
    jp: jax.Array,  # (C, 6, K) whitened point-Jacobian planes
    vinv6: jax.Array,  # (C, 6, K) gathered Vinv unique entries (symmetric)
    interpret: bool = False,
) -> jax.Array:
    """Returns (C, 8, 8) coupling blocks: sum_k W Vinv W^T."""
    c, _, k = jc.shape
    dtype = jc.dtype
    return pl.pallas_call(
        _coupling_kernel,
        grid=(c,),
        in_specs=[
            pl.BlockSpec((1, 16, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 6, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 6, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, 8, 8), dtype),
        interpret=interpret,
    )(jc, jp, vinv6)
