"""Rates of the small per-iteration ops: batched 8x8 cholesky / cho_solve /
matvec / 800-dim dots (carry-dependent scan, whole-executable timing)."""

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
C = 100


def timed(fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / REPS


rng = np.random.default_rng(0)
a = jnp.asarray(rng.normal(size=(C, 8, 8)), jnp.float32)
spd = jnp.einsum("cij,ckj->cik", a, a) + 8.0 * jnp.eye(8)[None]
r = jnp.asarray(rng.normal(size=(C, 8)), jnp.float32)
chol = jax.vmap(jnp.linalg.cholesky)(spd)


def scan_op(op, *xs):
    def body(carry, _):
        k, acc = carry
        out = op(k, *xs)
        return (k + 1, acc + jnp.sum(out, dtype=jnp.float32)), None

    def fn(*xs):
        (_, acc), _ = jax.lax.scan(body, (jnp.float32(0), jnp.float32(0)), None, length=REPS)
        return acc

    return fn


cases = {
    "cholesky_100x8x8": (
        scan_op(lambda k, m: jax.vmap(jnp.linalg.cholesky)(m + k * 1e-6 * jnp.eye(8)), spd),
        (spd,),
    ),
    "cho_solve_100x8": (
        scan_op(
            lambda k, ch, rr: jax.vmap(
                lambda c_, r_: jax.scipy.linalg.cho_solve((c_, True), r_)
            )(ch, rr + k * 1e-6),
            chol, r,
        ),
        (chol, r),
    ),
    "matvec_100x8x8": (
        scan_op(lambda k, m, rr: jnp.einsum("cij,cj->ci", m, rr + k * 1e-6), spd, r),
        (spd, r),
    ),
    "dot_800": (
        scan_op(lambda k, rr: jnp.sum((rr + k * 1e-6) * rr), r),
        (r,),
    ),
    "inv8x8_via_solve": (
        scan_op(
            lambda k, m: jnp.linalg.solve(
                m + k * 1e-6 * jnp.eye(8), jnp.broadcast_to(jnp.eye(8), m.shape)
            ),
            spd,
        ),
        (spd,),
    ),
}

for name, (fn, args) in cases.items():
    dt = timed(fn, *args)
    print(json.dumps({"case": name, "us": round(dt * 1e6, 2)}), flush=True)
