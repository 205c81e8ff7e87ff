"""One-hot dot cost structure: operand dtype / materialization grid.

tpu_selection_dot.py round 1 falsified two hypotheses at BAL shapes
(one-hot (14, 256, 272384)):

  1. precision does NOT matter: f32 HIGHEST == HIGH == DEFAULT == ~7.6-7.9
     ms on the cam orientation — there is no 6-pass re-stream.
  2. the bf16x3 split (stacked or not) is silently DESTROYED on TPU: the
     result error equals plain bf16 (2.1e-3 rel).  XLA:TPU's bf16
     propagation pass computes the split chain (x - bf16(x)) in bf16,
     making the mid/lo terms zero.

At 7.9 ms the cam dot moves ~1.27 GB of essential bytes at ~160 GB/s —
20% of HBM peak — so something structural eats 4-5x.  Prime suspect: the
int8 -> f32/bf16 widening convert is MATERIALIZED as a full copy rather
than folded into the MXU operand read.  This grid measures the cam /
matvec / reduction orientations against one-hot storage dtype and lhs
dtype to locate the wall:

  hi_i8    f32 lhs x int8 one-hot, HIGHEST   (engine today)
  hi_bf    f32 lhs x bf16 one-hot, HIGHEST
  hi_f32   f32 lhs x f32 one-hot, HIGHEST    (no convert at all)
  df_bf    bf16 lhs x bf16 one-hot, DEFAULT  (single-pass floor, bf16 acc)
  df_i8bf  bf16 lhs x int8 one-hot, DEFAULT  (single pass + convert)

plus optimization-barrier-protected bf16x3 splits (exactness rescue):

  sb3_i8   3 barrier-split bf16 terms stacked x int8, DEFAULT
  sb3_bf   3 barrier-split bf16 terms stacked x bf16 one-hot, DEFAULT

Numerics for the sb3 variants are checked against a f64 numpy oracle —
the barrier must restore exact-f32 selection.

Run: cd /root/repo && python experiments/tpu_selection_dot2.py [steps reps]
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
    bucket = problem.buckets[-1]
    oh8 = bucket.onehot  # int8 (G, W, N)
    g, w, n = oh8.shape
    gb = oh8.size / 1e9
    print(f"one-hot {oh8.shape}: int8 {gb:.2f} GB / bf16 {2*gb:.2f} GB",
          flush=True)

    # Pre-materialized storage encodings (one device copy each).
    @jax.jit
    def to_bf16(o):
        return o.astype(jnp.bfloat16)

    oh_bf = to_bf16(oh8)
    oh_f32 = jax.jit(lambda o: o.astype(jnp.float32))(oh8)

    rng = np.random.default_rng(0)
    d_cam, k_red, i_vec = 19, 44, 8
    lhs_np = {
        "cam": rng.standard_normal((g, w, d_cam), np.float32),
        "red": rng.standard_normal((k_red, g, n)).astype(np.float32),
        "mv": rng.standard_normal((g, w, i_vec), np.float32),
    }
    lhs = {name: commit(jnp.asarray(a)) for name, a in lhs_np.items()}
    spec = {"cam": "gwd,gwn->gdn", "red": "kgn,gwn->gwk", "mv": "gwi,gwn->ign"}

    def split_stack_barrier(x, terms):
        """(terms, *x.shape) bf16; optimization_barrier pins each remainder
        so XLA's bf16 propagation cannot demote the f32 subtraction."""
        out = []
        rem = x
        for _ in range(terms):
            h = rem.astype(jnp.bfloat16)
            out.append(h)
            rem = lax.optimization_barrier(rem - h.astype(x.dtype))
        return jnp.stack(out)

    def stacked_eq(eq):
        ins, out = eq.split("->")
        a, b = ins.split(",")
        return f"t{a},{b}->t{out}"

    def make_variant(eq, kind):
        if kind.startswith("hi_") or kind.startswith("df_"):
            prec = (lax.Precision.HIGHEST if kind.startswith("hi_")
                    else lax.Precision.DEFAULT)
            cast_lhs = kind.startswith("df_")

            def f(x, o):
                if cast_lhs:
                    x = x.astype(jnp.bfloat16)
                return jnp.einsum(eq, x, o, precision=prec,
                                  preferred_element_type=jnp.float32)

            return f

        teq = stacked_eq(eq)  # sb3_*

        def f(x, o):
            y = jnp.einsum(teq, split_stack_barrier(x, 3), o,
                           precision=lax.Precision.DEFAULT,
                           preferred_element_type=jnp.float32)
            return y[0] + y[1] + y[2]

        return f

    # (kind, one-hot array) pairs
    grid = [
        ("hi_i8", oh8), ("hi_bf", oh_bf), ("hi_f32", oh_f32),
        ("df_bf", oh_bf), ("df_i8bf", oh8),
        ("sb3_i8", oh8), ("sb3_bf", oh_bf),
    ]

    # --- numerics on a slice -------------------------------------------
    ns = 4096
    oh_slice = np.asarray(jax.device_get(oh8[:, :, :ns]))
    oh_s64 = oh_slice.astype(np.float64)
    for name in spec:
        eq = spec[name]
        x_np = lhs_np[name]
        x_s = x_np if name != "red" else x_np[:, :, :ns]
        oracle = np.einsum(eq, x_s.astype(np.float64), oh_s64)
        scale = max(np.max(np.abs(oracle)), 1e-30)
        x_dev = commit(jnp.asarray(x_s))
        errs = []
        for kind, oh_full in grid:
            o_dev = commit(jnp.asarray(
                oh_slice.astype(np.asarray(jax.device_get(oh_full[:1, :1, :1])).dtype)
            ))
            fv = jax.jit(make_variant(eq, kind))
            got = np.asarray(jax.device_get(fv(x_dev, o_dev)), np.float64)
            errs.append(f"{kind} {np.max(np.abs(got - oracle)) / scale:.1e}")
        print(f"numerics {name}:  " + "  ".join(errs), flush=True)

    # --- timing ----------------------------------------------------------
    def timed(eq, kind):
        f = make_variant(eq, kind)

        def run(x0, o):
            def step(carry, _):
                out = f(carry, o)
                s = jnp.sum(out * out)
                return carry * (1.0 + 1e-30 * s), s

            _, ss = lax.scan(step, x0, None, length=steps)
            return ss

        return jax.jit(run)

    fns = {}
    for name in spec:
        for kind, oh_full in grid:
            fns[(name, kind)] = (timed(spec[name], kind), oh_full)
    for (name, kind), (f, o) in fns.items():
        t0 = time.time()
        jax.device_get(f(lhs[name], o)[0])
        print(f"compile {name}/{kind}: {time.time()-t0:.1f}s", flush=True)

    results: dict = {}
    for _ in range(reps):
        for (name, kind), (f, o) in fns.items():
            t0 = time.time()
            jax.device_get(f(lhs[name], o)[0])
            results.setdefault((name, kind), []).append(
                (time.time() - t0) / steps * 1e3
            )
    for name in spec:
        row = []
        for kind, _ in grid:
            ts = sorted(results[(name, kind)])
            row.append(f"{kind} {ts[len(ts) // 2]:.1f}")
        print(f"timing {name} (ms median):  " + "  ".join(row), flush=True)


if __name__ == "__main__":
    a = [int(v) for v in sys.argv[1:]]
    main(*a)
