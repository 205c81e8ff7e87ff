"""Interleaved A/B: XLA two-pass PCG matvec vs single-pass Pallas kernel.

The wtt PCG matvec streams one-hots + jc/jp twice per CG iteration
(~4.9 GB at BAL scale); ops/pallas/wtt_matvec.py streams them once.
Fixed-work solves (cg_rtol=0, 8 CG iterations, 3 LM iters) interleaved
in one process.

Run: cd /root/repo && python experiments/tpu_wtt_matvec_ab.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(reps: int = 5) -> None:
    import jax

    from tpu3drecon.problems.wtt import expand_onehots
    from tpu3drecon.solvers.ba_wtt import make_wtt_ba_solver
    from tpu3drecon.solvers.bundle_adjust import BAConfig
    from tpu3drecon.utils.placement import commit

    print("backend:", jax.default_backend(), flush=True)

    from tpu3drecon.benchmark.balscale import bal_sequential_wtt

    wtt = bal_sequential_wtt()
    wtt = expand_onehots(commit(wtt))
    jax.device_get(wtt.buckets[0].uv[0, 0, 0, 0])

    base = BAConfig(maxiter=3, gtol=0.0, ftol=0.0, cg_maxiter=8, cg_rtol=0.0)
    solvers = {}
    for name, cfg in (
        ("xla", base),
        ("kernel", base._replace(matvec_kernel=True)),
    ):
        s = make_wtt_ba_solver(cfg)
        t0 = time.time()
        try:
            out = s(wtt)
            loss = float(jax.device_get(out[2].loss))
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            continue
        print(f"{name}: compile+first {time.time()-t0:.1f}s loss {loss:.6f}",
              flush=True)
        solvers[name] = s

    times = {n: [] for n in solvers}
    for _ in range(reps):
        for n, s in solvers.items():
            t0 = time.time()
            jax.device_get(s(wtt)[2].loss)
            times[n].append(time.time() - t0)
    for n in solvers:
        ts = sorted(times[n])
        print(
            f"{n}: best {ts[0]:.3f}s median {ts[len(ts)//2]:.3f}s "
            f"s/LM-iter {ts[0]/3:.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5)
