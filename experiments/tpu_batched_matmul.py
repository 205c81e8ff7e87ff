"""True TPU rates for the wtt engine's contraction shapes.

LESSON (first version of this file was wrong): reducing a matmul's output
with a SLICE (``jnp.sum(out[:, 0, :1])``) lets XLA push the slice through
the dot and skip ~all the work — every case measured ~3 ms regardless of
shape.  All reductions here are full sums against a random mask, which XLA
does not rewrite into the contraction.

Cases:
  - batched  (G, W, k) x (G, W, n)  — the wtt per-chunk window contraction
  - grouped  (B, W, k) x (B, W, n*) — chunks merged by shared cam_base
                                       (B ~ c_pad/128 large batches)
  - dense    (C, k) x (C, n_tot)    — the tt engine's single matmul

  python experiments/tpu_batched_matmul.py [--cpu]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time


def main():
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from tpu3drecon.utils.timing import device_sync

    rng = np.random.default_rng(0)
    W = 256
    SLOTS = 983040  # ~1M slots, divisible by lots of chunk sizes
    hp = jax.lax.Precision.HIGHEST

    def bench(name, make_body, *args, reps=10, flops=None):
        def fn(*a):
            def body(acc, _):
                return make_body(acc, *a), None

            s, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
            return s

        jfn = jax.jit(fn)
        out = jfn(*args)
        device_sync(out)
        t0 = time.time()
        out = jfn(*args)
        device_sync(out)
        dt = (time.time() - t0) / reps
        rec = {"case": name, "per_rep_ms": round(dt * 1e3, 3)}
        if flops:
            rec["gflops"] = round(flops / dt / 1e9, 1)
        print(json.dumps(rec), flush=True)

    for k in (8, 19):
        for n_chunk in (2048, 8192):
            G = SLOTS // n_chunk
            a = jnp.asarray(rng.standard_normal((G, W, k)), jnp.float32)
            b = jnp.asarray(rng.standard_normal((G, W, n_chunk)), jnp.float32)
            m = jnp.asarray(rng.standard_normal((G, k, n_chunk)), jnp.float32)
            fl = 2 * G * W * k * n_chunk

            def body(acc, a, b, m):
                out = jnp.einsum("gwk,gwn->gkn", a + 0.0 * acc, b, precision=hp)
                return jnp.sum(out * m)

            bench(f"batched_G{G}_n{n_chunk}_k{k}", body, a, b, m, flops=fl)

    # Grouped: B large batches (the cam_base-grouped reformulation).
    for k in (8, 19):
        for B in (4, 14):
            n_g = SLOTS // B
            a = jnp.asarray(rng.standard_normal((B, W, k)), jnp.float32)
            b = jnp.asarray(rng.standard_normal((B, W, n_g)), jnp.float32)
            m = jnp.asarray(rng.standard_normal((B, k, n_g)), jnp.float32)
            fl = 2 * B * W * k * n_g

            def body(acc, a, b, m):
                out = jnp.einsum("gwk,gwn->gkn", a + 0.0 * acc, b, precision=hp)
                return jnp.sum(out * m)

            bench(f"grouped_B{B}_n{n_g}_k{k}", body, a, b, m, flops=fl)

    # Dense reference: (C, k) x (C, SLOTS) — the tt engine's op, C=512.
    for k in (8, 19):
        a = jnp.asarray(rng.standard_normal((512, k)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((512, SLOTS)), jnp.float32)
        m = jnp.asarray(rng.standard_normal((k, SLOTS)), jnp.float32)
        fl = 2 * 512 * k * SLOTS

        def body(acc, a, b, m):
            out = jnp.einsum("ck,cn->kn", a + 0.0 * acc, b, precision=hp)
            return jnp.sum(out * m)

        bench(f"dense_C512_k{k}", body, a, b, m, flops=fl)

    # Reduce direction, batched vs grouped: contract n, output (., W, k).
    for k in (8, 48):
        G = SLOTS // 2048
        c = jnp.asarray(rng.standard_normal((G, k, 2048)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((G, W, 2048)), jnp.float32)
        m = jnp.asarray(rng.standard_normal((G, W, k)), jnp.float32)
        fl = 2 * G * W * k * 2048

        def body(acc, c, b, m):
            out = jnp.einsum("gkn,gwn->gwk", c + 0.0 * acc, b, precision=hp)
            return jnp.sum(out * m)

        bench(f"batchedred_G{G}_n2048_k{k}", body, c, b, m, flops=fl)

        B = 14
        n_g = SLOTS // B
        c = jnp.asarray(rng.standard_normal((B, k, n_g)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((B, W, n_g)), jnp.float32)
        m = jnp.asarray(rng.standard_normal((B, W, k)), jnp.float32)
        fl = 2 * B * W * k * n_g

        def body2(acc, c, b, m):
            out = jnp.einsum("gkn,gwn->gwk", c + 0.0 * acc, b, precision=hp)
            return jnp.sum(out * m)

        bench(f"groupedred_B{B}_n{n_g}_k{k}", body2, c, b, m, flops=fl)


if __name__ == "__main__":
    main()
