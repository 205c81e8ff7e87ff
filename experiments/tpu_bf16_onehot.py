"""Does bf16 one-hot storage halve the wtt engine's dominant HBM stream?

The one-hots are {0,1} — exactly representable in bf16 — and at BAL scale
they are 4.2 GB read ~20x per LM iteration.  If XLA fuses the bf16->f32
convert into the matmul's operand read, storage in bf16 halves that
traffic with BIT-IDENTICAL results (the f32 convert of {0,1} bf16 is
exact, and the other operand stays f32 under precision=highest).

Measures both contraction directions at BAL-group shapes, bf16 vs f32
storage, plus a numerical-equality check.

  python experiments/tpu_bf16_onehot.py [--cpu]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np


def main():
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tpu3drecon.utils.timing import device_sync

    rng = np.random.default_rng(0)
    B, W, N, D = 14, 256, 272384, 19
    hp = jax.lax.Precision.HIGHEST

    onehot_np = (rng.random((B, W, N)) < 0.004).astype(np.float32)
    tw = jax.device_put(
        rng.standard_normal((B, W, D)).astype(np.float32)
    )
    mask = jax.device_put(rng.standard_normal((B, D, N)).astype(np.float32))
    oh_f32 = jax.device_put(onehot_np)
    oh_bf16 = jax.device_put(onehot_np.astype(jnp.bfloat16))

    def bench(name, fn, *args, reps=10):
        jfn = jax.jit(fn)
        out = jfn(*args)
        device_sync(out)
        t0 = time.time()
        out = jfn(*args)
        device_sync(out)
        print(json.dumps({
            "case": name,
            "per_rep_ms": round((time.time() - t0) / reps * 1e3, 2),
        }), flush=True)

    def planes_fn(tw, oh, mask):
        def body(acc, _):
            out = jnp.einsum(
                "gwd,gwn->gdn", tw + 0.0 * acc, oh.astype(tw.dtype),
                precision=hp,
            )
            return jnp.sum(out * mask), None

        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=10)
        return s

    bench("cam_planes_oh_f32", planes_fn, tw, oh_f32, mask)
    bench("cam_planes_oh_bf16", planes_fn, tw, oh_bf16, mask)

    planes8 = jax.device_put(rng.standard_normal((B, 8, N)).astype(np.float32))
    mask8 = jax.device_put(rng.standard_normal((B, W, 8)).astype(np.float32))

    def reduce_fn(p, oh, mask):
        def body(acc, _):
            out = jnp.einsum(
                "gkn,gwn->gwk", p + 0.0 * acc, oh.astype(p.dtype),
                precision=hp,
            )
            return jnp.sum(out * mask), None

        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=10)
        return s

    bench("reduce_oh_f32", reduce_fn, planes8, oh_f32, mask8)
    bench("reduce_oh_bf16", reduce_fn, planes8, oh_bf16, mask8)

    # Exactness: {0,1} bf16 converts exactly; outputs must be bit-equal.
    small = jax.jit(
        lambda tw, oh: jnp.einsum(
            "gwd,gwn->gdn", tw, oh.astype(tw.dtype), precision=hp
        )
    )
    a = np.asarray(jax.device_get(small(tw, oh_f32)))
    b = np.asarray(jax.device_get(small(tw, oh_bf16)))
    print(json.dumps({"case": "bit_equal", "equal": bool((a == b).all())}),
          flush=True)


if __name__ == "__main__":
    main()
