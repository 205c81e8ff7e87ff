"""Locate the ~6 ms fixed cost of the BAL one-hot dots (round-4 follow-up).

tpu_selection_dot2.py measured every encoding of the cam/mv/red one-hot
dots inside a narrow 7-19 ms band with a near-peak MARGINAL byte cost
(int8 -> bf16 -> f32 one-hots: +0.97 GB -> +0.8 ms, +1.95 GB -> +2.8 ms
on the cam orientation) — i.e. a ~6 ms FIXED cost per dot that stream
compression cannot touch.  This grid varies the dot's structural knobs
one at a time on the real BAL one-hot (14, 256, 272384) int8:

  d-scaling   cam dot with D in {8, 19, 64, 128}   (MXU lane util?)
  g-scaling   cam dot on the first {2, 7, 14} groups (per-batch cost?)
  n-scaling   cam dot on N/{4, 2, 1} slot slices     (pure stream share?)
  stream      jnp.sum(oh, axis=1) — the achievable read rate for this
              exact array with no MXU involved (control)
  matvec-i    mv dot with i in {8, 32, 128}

All dots run f32-lhs x int8 one-hot at HIGHEST (the engine's form),
carry-dependent scan, full-reduce outputs, one-hot as a jit argument.

Run: cd /root/repo && python experiments/tpu_selection_dot3.py [steps reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(steps: int = 4, reps: int = 6) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from tpu3drecon.benchmark.balscale import bal_sequential_wtt
    from tpu3drecon.problems.wtt import expand_onehots
    from tpu3drecon.utils.placement import commit

    print("backend:", jax.default_backend(), flush=True)
    problem = commit(expand_onehots(bal_sequential_wtt()))
    oh = problem.buckets[-1].onehot  # (G, W, N) int8
    g, w, n = oh.shape
    print(f"one-hot {oh.shape} {oh.dtype}", flush=True)

    rng = np.random.default_rng(0)

    def timed(f):
        def run(x0, o):
            def step(carry, _):
                out = f(carry, o)
                s = jnp.sum(out * out)
                return carry * (1.0 + 1e-30 * s), s

            _, ss = lax.scan(step, x0, None, length=steps)
            return ss

        return jax.jit(run)

    cases = []  # (label, fn, lhs, oh_arg)

    def cam_fn(x, o):
        return jnp.einsum("gwd,gwn->gdn", x, o,
                          precision=lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)

    # --- d-scaling ---------------------------------------------------------
    for d in (8, 19, 64, 128):
        lhs = commit(jnp.asarray(
            rng.standard_normal((g, w, d), np.float32)))
        cases.append((f"cam_d{d}", cam_fn, lhs, oh))

    # --- g-scaling (slice the one-hot's leading axis) ----------------------
    for gs in (2, 7):
        lhs = commit(jnp.asarray(
            rng.standard_normal((gs, w, 19), np.float32)))
        ohs = jax.jit(lambda o, gs=gs: o[:gs])(oh)
        cases.append((f"cam_g{gs}", cam_fn, lhs, ohs))

    # --- n-scaling (slice the slot axis) -----------------------------------
    for div in (4, 2):
        ns = n // div
        lhs = commit(jnp.asarray(
            rng.standard_normal((g, w, 19), np.float32)))
        ohs = jax.jit(lambda o, ns=ns: o[:, :, :ns])(oh)
        cases.append((f"cam_n/{div}", cam_fn, lhs, ohs))

    # --- pure-stream control ----------------------------------------------
    def stream_fn(x, o):
        return jnp.sum(o, axis=1).astype(jnp.float32) + x

    lhs0 = commit(jnp.zeros((g, n), jnp.float32))
    cases.append(("stream_sum_w", stream_fn, lhs0, oh))

    # --- matvec i-scaling --------------------------------------------------
    def mv_fn(x, o):
        return jnp.einsum("gwi,gwn->ign", x, o,
                          precision=lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)

    for i in (8, 32, 128):
        lhs = commit(jnp.asarray(
            rng.standard_normal((g, w, i), np.float32)))
        cases.append((f"mv_i{i}", mv_fn, lhs, oh))

    fns = {}
    for label, f, lhs, o in cases:
        fns[label] = (timed(f), lhs, o)
    for label, (f, lhs, o) in fns.items():
        t0 = time.time()
        jax.device_get(f(lhs, o)[0])
        print(f"compile {label}: {time.time()-t0:.1f}s", flush=True)

    results: dict = {}
    for _ in range(reps):
        for label, (f, lhs, o) in fns.items():
            t0 = time.time()
            jax.device_get(f(lhs, o)[0])
            results.setdefault(label, []).append(
                (time.time() - t0) / steps * 1e3)
    for label, _f in fns.items():
        ts = sorted(results[label])
        print(f"timing {label}: median {ts[len(ts)//2]:.2f} ms "
              f"(best {ts[0]:.2f})", flush=True)


if __name__ == "__main__":
    a = [int(v) for v in sys.argv[1:]]
    main(*a)
