"""complex64-packed row gathers.

TPU gathers move roughly one ELEMENT per cycle regardless of element width,
so a gather of (N, d) float32 rows costs ~N*d cycles.  Packing adjacent f32
pairs into complex64 halves the element count (round-2 measured lever; the
round-1 numbers put ~60-70% of the BA matvec in exactly these transport
gathers).  Pack once per source, gather many times.

The pack is arithmetic (re + 1j*im), which XLA fuses into the producing
op; the unpack is real/imag extraction fused into the consumer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pack_rows(src: jax.Array) -> jax.Array:
    """(..., d) f32 -> (..., ceil(d/2)) complex64 (zero-padded if d is odd)."""
    d = src.shape[-1]
    if d % 2:
        src = jnp.pad(src, [(0, 0)] * (src.ndim - 1) + [(0, 1)])
    re = src[..., 0::2]
    im = src[..., 1::2]
    return jax.lax.complex(re, im)


def unpack_rows(packed: jax.Array, d: int) -> jax.Array:
    """Inverse of pack_rows: (..., ceil(d/2)) complex64 -> (..., d) f32."""
    re = jnp.real(packed)
    im = jnp.imag(packed)
    full = jnp.stack([re, im], axis=-1).reshape(*packed.shape[:-1], -1)
    return full[..., :d]


def gather_rows_packed(src: jax.Array, idx: jax.Array) -> jax.Array:
    """src (N, d) f32 gathered by idx (any shape) -> (idx.shape + (d,)) f32,
    moving half the elements of a plain src[idx]."""
    d = src.shape[-1]
    return unpack_rows(pack_rows(src)[idx], d)
