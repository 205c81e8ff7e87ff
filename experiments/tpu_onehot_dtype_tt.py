"""Bench-scale (tt engine) one-hot dtype ladder with the 30-iter RMSE oracle.

Companion to experiments/tpu_onehot_dtype.py (BAL-scale wtt, fixed work):
this one runs the FULL bench config (30 LM iters, cg=8 schur_jacobi) so the
final pixel RMSE vs ground truth validates that 1-byte one-hot encodings do
not disturb convergence quality.  On TPU the dot pass structure differs by
operand dtype (f32 accumulation order shifts the LM trajectory — the same
variance class as the round-3 chunk-budget variants), so per-iteration
losses are NOT expected to match bit-for-bit; the 30-iter RMSE against the
1.335e-5 px pin is the acceptance test.

Run: cd /root/repo && python experiments/tpu_onehot_dtype_tt.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(reps: int = 5) -> None:
    import jax
    import jax.numpy as jnp

    from tpu3drecon.benchmark.medium_config import BENCH_CONFIG, build_problem
    from tpu3drecon.problems.tt import tt_from_flat
    from tpu3drecon.solvers.ba_tt import make_tt_ba_solver
    from tpu3drecon.solvers.bundle_adjust import reprojection_rmse
    from tpu3drecon.utils.placement import commit

    print("backend:", jax.default_backend(), flush=True)

    flat_host = build_problem(on_host=True)
    solver = make_tt_ba_solver(BENCH_CONFIG)

    problems = {}
    for name, dt in (
        ("bf16", jnp.bfloat16),
        ("int8", jnp.int8),
        ("f8_e4m3", jnp.float8_e4m3fn),
    ):
        problems[name] = commit(tt_from_flat(flat_host, onehot_dtype=dt))
        gb = sum(
            b.onehot.size * b.onehot.dtype.itemsize
            for b in problems[name].buckets
        ) / 1e9
        print(f"{name}: one-hots {gb:.3f} GB", flush=True)

    results = {}
    for name, p in problems.items():
        t0 = time.time()
        try:
            cams, pts, state = solver(p)
            jax.device_get(state.loss)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            del problems[name]
            continue
        rmse = float(jax.device_get(reprojection_rmse(flat_host, cams, pts)))
        results[name] = rmse
        print(f"{name}: compile+first {time.time()-t0:.1f}s RMSE {rmse:.4e}",
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
            f"{n}: best {ts[0]:.4f}s median {ts[len(ts)//2]:.4f}s "
            f"RMSE {results[n]:.4e}",
            flush=True,
        )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5)
