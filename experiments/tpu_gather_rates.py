"""TPU gather rate model: what does a gather actually cost per element/row?

Loops each gather 200x inside one jitted lax.scan so the ~3-9ms tunnel
dispatch overhead amortizes away (whole-executable timing only).  The result
decides the transport design for the BA matvec (RESULTS.md round 2).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpu3drecon.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

REPS = 200
P = 100_000
N = 204_800  # grid obs count
SLOTS = 448 * 1024  # track slots


def timed(fn, *args):
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / REPS


def scan_gather(src, idx):
    n_src = src.shape[0]

    def body(carry, _):
        k, acc = carry
        # The index perturbation makes each gather carry-dependent so XLA
        # cannot hoist it out of the scan (the first version of this bench
        # measured a hoisted single gather: ~0.3ms for everything).
        g = src[(idx + k) % n_src]
        return (k + 1, acc + g.sum(dtype=jnp.float32)), None

    def fn(src, idx):
        (_, acc), _ = jax.lax.scan(
            body, (jnp.int32(0), jnp.float32(0)), None, length=REPS
        )
        return acc

    return fn


rng = np.random.default_rng(0)
idx_n = jnp.asarray(rng.integers(0, P, size=N), jnp.int32)
idx_n_sorted = jnp.sort(idx_n)
idx_slots = jnp.asarray(rng.integers(0, N, size=SLOTS), jnp.int32)

cases = []
for d, dt, name in [
    (3, jnp.float32, "y_f32_w3"),
    (4, jnp.float32, "y_f32_w4"),
    (3, jnp.bfloat16, "y_bf16_w3"),
    (1, jnp.float32, "y_f32_w1"),
    (8, jnp.float32, "y_f32_w8"),
]:
    src = jnp.asarray(rng.normal(size=(P, d)), dt)
    cases.append((name, src, idx_n, N * d))

src3 = jnp.asarray(rng.normal(size=(P, 3)), jnp.float32)
cases.append(("y_f32_w3_sorted", src3, idx_n_sorted, N * 3))

for d, dt, name in [
    (8, jnp.float32, "jpr_f32_w8"),
    (8, jnp.bfloat16, "jpr_bf16_w8"),
    (2, jnp.float32, "s_f32_w2"),
    (2, jnp.bfloat16, "s_bf16_w2"),
]:
    src = jnp.asarray(rng.normal(size=(N, d)), dt)
    cases.append((name, src, idx_slots, SLOTS * d))

for name, src, idx, elems in cases:
    dt = timed(scan_gather(src, idx), src, idx)
    print(json.dumps({
        "case": name, "ms": round(dt * 1e3, 4),
        "elems": elems,
        "ns_per_elem": round(dt / elems * 1e9, 3),
        "ns_per_row": round(dt / len(idx) * 1e9, 2),
        "GBps": round(elems * src.dtype.itemsize / dt / 1e9, 1),
    }), flush=True)
