"""Selection-dot precision ladder: one-hot einsums as stacked bf16x3 dots.

The round-4 anatomy pinned the BAL-scale wtt fixed cost on the one-hot
einsums (experiments/tpu_lin_phases.py: cam-plane expansion 28.7 ms of the
66.4 ms linearize; the contribution reduction dominates the +34 ms tail;
each CG matvec 7.5 ms vs a 3.75 ms floor).  All of them run f32 under
``jax.default_matmul_precision("highest")`` — on the TPU MXU a ~6-pass
bf16 decomposition that RE-STREAMS the GB-scale one-hot operand every
pass (6 x 0.98 GB = 5.9 GB = 7.2 ms at 819 GB/s: exactly the measured
matvec).

A dot against an EXACT {0,1} one-hot needs no generic f32 emulation:
split the f32 operand into three bf16 terms (hi/mid/lo cover the 24-bit
mantissa), STACK them on a new leading axis, and run ONE single-pass
DEFAULT-precision bf16 dot with f32 accumulation; sum the three output
planes in f32.  Every per-term product is exact (bf16 x {0,1}), so the
result is f32-faithful while streaming the one-hot ONCE.

Why stacked, not three separate einsums: XLA's dot merger rewrites
dot(h,o) + dot(m,o) + dot(l,o) into dot(h+m+l, o) with the operand sum in
bf16 — measured on the axon TPU as exactly single-bf16 error (2.1e-3
rel), silently undoing the split.  The stacked form is un-mergeable and
cheaper anyway.

Orientations measured on the real BAL bucket shapes:

  cam-planes   "gwd,gwn->gdn"  (d=19 table columns; pure per-slot selection)
  reduction    "kgn,gwn->gwk"  (k=44 contribution planes -> window rows)
  matvec-xg    "gwi,gwn->ign"  (i=8 CG vector columns; selection)

variants: f32 HIGHEST (current engine behavior), f32 HIGH, stacked bf16x3,
stacked bf16x2, f32 DEFAULT (timing + error reference).  Numerics vs a
float64 numpy oracle on a slice (f32 HIGHEST judged against it too).

Run: cd /root/repo && python experiments/tpu_selection_dot.py [steps reps]
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
    oh = bucket.onehot
    g, w, n = oh.shape
    print(f"bucket onehot {oh.shape} {oh.dtype} "
          f"({oh.size * oh.dtype.itemsize / 1e9:.2f} GB)", flush=True)

    rng = np.random.default_rng(0)
    d_cam, k_red, i_vec = 19, 44, 8
    lhs_np = {
        "cam": rng.standard_normal((g, w, d_cam), np.float32),
        "red": rng.standard_normal((k_red, g, n)).astype(np.float32),
        "mv": rng.standard_normal((g, w, i_vec), np.float32),
    }
    lhs = {name: commit(jnp.asarray(a)) for name, a in lhs_np.items()}
    spec = {"cam": "gwd,gwn->gdn", "red": "kgn,gwn->gwk", "mv": "gwi,gwn->ign"}

    def split_stack(x, terms):
        """(terms, *x.shape) bf16 with sum_t out[t] == x (exactly, f32)."""
        out = []
        rem = x
        for _ in range(terms):
            h = rem.astype(jnp.bfloat16)
            out.append(h)
            rem = rem - h.astype(x.dtype)
        return jnp.stack(out)

    def make_variant(eq, kind):
        if kind in ("highest", "high", "default"):
            prec = dict(
                highest=lax.Precision.HIGHEST,
                high=lax.Precision.HIGH,
                default=lax.Precision.DEFAULT,
            )[kind]

            def f(x, o):
                return jnp.einsum(eq, x, o, precision=prec,
                                  preferred_element_type=jnp.float32)

            return f
        terms = int(kind[-1])  # stack3 / stack2
        ins, out = eq.split("->")
        a, _ = ins.split(",")
        teq = f"t{a},{ins.split(',')[1]}->t{out}"

        def f(x, o):
            ob = o.astype(jnp.bfloat16)
            y = jnp.einsum(teq, split_stack(x, terms), ob,
                           precision=lax.Precision.DEFAULT,
                           preferred_element_type=jnp.float32)
            return jnp.sum(y, axis=0)

        return f

    kinds = ("highest", "high", "stack3", "stack2", "default")

    # --- numerics vs f64 oracle (small slice; exactness is per-element) ---
    ns = 4096
    oh_slice = jax.device_get(oh[:, :, :ns])
    oh_s = np.asarray(oh_slice, np.float64)
    for name in spec:
        eq = spec[name]
        x_np = lhs_np[name]
        x_s = x_np if name != "red" else x_np[:, :, :ns]
        oracle = np.einsum(eq, x_s.astype(np.float64), oh_s)
        scale = max(np.max(np.abs(oracle)), 1e-30)
        x_dev = commit(jnp.asarray(x_s))
        o_dev = commit(jnp.asarray(oh_slice))
        errs = []
        for kind in kinds:
            f = jax.jit(make_variant(eq, kind))
            got = np.asarray(jax.device_get(f(x_dev, o_dev)), np.float64)
            errs.append(f"{kind} {np.max(np.abs(got - oracle)) / scale:.2e}")
        print(f"numerics {name}: rel-max-err  " + "  ".join(errs), flush=True)

    # --- timing: carry-dependent scan; oh is an ARGUMENT (413 trap) -------
    def timed(eq, kind):
        f = make_variant(eq, kind)

        def run(x0, o):
            def step(carry, _):
                out = f(carry, o)
                s = jnp.sum(out * out)  # full reduce: no slice-pushdown
                return carry * (1.0 + 1e-30 * s), s

            _, ss = lax.scan(step, x0, None, length=steps)
            return ss

        return jax.jit(run)

    fns = {}
    for name in spec:
        for kind in kinds:
            fns[(name, kind)] = timed(spec[name], kind)
    for (name, kind), f in fns.items():
        t0 = time.time()
        jax.device_get(f(lhs[name], oh)[0])
        print(f"compile {name}/{kind}: {time.time()-t0:.1f}s", flush=True)

    results: dict = {}
    for _ in range(reps):
        for (name, kind), f in fns.items():
            t0 = time.time()
            jax.device_get(f(lhs[name], oh)[0])
            results.setdefault((name, kind), []).append(
                (time.time() - t0) / steps * 1e3
            )
    for name in spec:
        row = []
        for kind in kinds:
            ts = sorted(results[(name, kind)])
            row.append(f"{kind} {ts[len(ts) // 2]:.1f}ms (best {ts[0]:.1f})")
        print(f"timing {name}:  " + "  ".join(row), flush=True)


if __name__ == "__main__":
    a = [int(v) for v in sys.argv[1:]]
    main(*a)
