"""Interleaved one-hot dtype ladder for the wtt PCG matvec stream.

The round-4 roofline (experiments/roofline.py) puts the CG matvec streams
at 72% of BAL-scale bytes/LM-iter, and the one-hot reads at ~33 of those
41.3 GB.  bf16 storage already beat f32 by 1.3-1.55x (round 2,
experiments/tpu_bf16_onehot.py), proving XLA:TPU folds the widening
convert into the dot read instead of materializing it.  This ladder asks
whether 1-byte encodings ({0,1} is exact in int8 and float8) compress the
stream further, or whether the int8->f32 convert falls off the MXU's
native-input fast path and XLA materializes a widened copy (which would
measure as a ~2x one-hot stream REGRESSION, not a win).

All variants share every array except the one-hot (dataclasses.replace),
and {0,1} converts exactly from every dtype tested, so the f32 dot inputs
are identical — losses must match bit-for-bit across the ladder; any
difference is a harness bug.

Fixed-work solves (cg_rtol=0, 8 CG iters, 3 LM iters) interleaved in one
process at full BAL scale (1712 cams / 3.8M obs).

Run: cd /root/repo && python experiments/tpu_onehot_dtype.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(reps: int = 5) -> None:
    import jax
    import jax.numpy as jnp

    from tpu3drecon.problems.wtt import expand_onehots
    from tpu3drecon.solvers.ba_wtt import make_wtt_ba_solver
    from tpu3drecon.solvers.bundle_adjust import BAConfig
    from tpu3drecon.utils.placement import commit

    print("backend:", jax.default_backend(), flush=True)

    from tpu3drecon.benchmark.balscale import bal_sequential_wtt

    compact = commit(bal_sequential_wtt())
    jax.device_get(compact.buckets[0].uv[0, 0, 0, 0])

    ladder = [
        ("bf16", jnp.bfloat16),
        ("int8", jnp.int8),
        ("f8_e4m3", jnp.float8_e4m3fn),
        ("int4", jnp.int4),
    ]
    base = BAConfig(maxiter=3, gtol=0.0, ftol=0.0, cg_maxiter=8, cg_rtol=0.0)
    solver = make_wtt_ba_solver(base)

    problems = {}
    for name, dt in ladder:
        try:
            problems[name] = expand_onehots(compact, onehot_dtype=dt)
            gb = sum(
                b.onehot.size * b.onehot.dtype.itemsize
                for b in problems[name].buckets
            ) / 1e9
            print(f"{name}: one-hots {gb:.2f} GB", flush=True)
        except Exception as e:  # fp8 promotion support varies by jax version
            print(f"{name}: expand FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    losses = {}
    for name in list(problems):
        t0 = time.time()
        try:
            out = solver(problems[name])
            losses[name] = float(jax.device_get(out[2].loss))
        except Exception as e:
            print(f"{name}: solve FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            del problems[name]
            continue
        print(
            f"{name}: compile+first {time.time()-t0:.1f}s loss {losses[name]:.9e}",
            flush=True,
        )

    ref = losses.get("bf16")
    for name, loss in losses.items():
        if ref is not None and loss != ref:
            print(f"WARNING: {name} loss differs from bf16 ({loss!r} vs {ref!r})",
                  flush=True)

    times = {n: [] for n in problems}
    for _ in range(reps):
        for n, p in problems.items():
            t0 = time.time()
            jax.device_get(solver(p)[2].loss)
            times[n].append(time.time() - t0)
    for n in problems:
        ts = sorted(times[n])
        print(
            f"{n}: best {ts[0]:.3f}s median {ts[len(ts)//2]:.3f}s "
            f"s/LM-iter {ts[0]/3:.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5)
