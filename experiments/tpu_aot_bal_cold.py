"""BAL cold-process time-to-first-LM-iteration with the AOT cache.

Round-3 verdict item #4: the BAL executable serialized at ~90-165 MB,
over the measured-for-good-reason 64 MB AOT entry cap
(utils/aot_cache.py; >64 MB entries re-pay a large first-exec cost or
abort the backend — re-measured round 4, still negative), so every
process re-paid the 20-30 s XLA compile.  The fully-indexed engine
(round 4b) removed the dense one-hot program paths and split_windows
(round 4c) removed the plane transients' chunk loop — this measures
whether the production BAL program now fits the cap, and if so, what a
COLD PROCESS actually pays from exec() to the first completed LM solve.

Run twice (same command): first populates the cache, second measures
the warm-cache cold-process path.

Run: cd /root/repo && python experiments/tpu_aot_bal_cold.py
"""

from __future__ import annotations

import os
import sys
import time

T0 = time.time()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    from tpu3drecon.benchmark.balscale import bal_sequential_wtt
    from tpu3drecon.solvers.ba_wtt import make_wtt_ba_solver
    from tpu3drecon.solvers.bundle_adjust import BAConfig
    from tpu3drecon.utils import aot_cache
    from tpu3drecon.utils.placement import commit

    print(f"[{time.time()-T0:6.1f}s] backend: {jax.default_backend()}",
          flush=True)
    config = BAConfig(
        maxiter=3, gtol=0.0, ftol=0.0, cg_maxiter=8, cg_rtol=0.0,
        precond="schur_jacobi",
        matvec_kernel="index", linearize_kernel="index",
    )
    problem = commit(bal_sequential_wtt(split_windows=True))
    print(f"[{time.time()-T0:6.1f}s] problem on device", flush=True)

    solver = make_wtt_ba_solver(config, aot=True)
    t0 = time.time()
    _, pts, st = solver(problem)
    jax.block_until_ready(pts)
    loss = float(jax.device_get(st.loss))
    print(
        f"[{time.time()-T0:6.1f}s] first solve done: {time.time()-t0:.1f}s "
        f"(loss {loss:.4e}, {int(jax.device_get(st.accepted))}/3 accepted)",
        flush=True,
    )
    print(f"TOTAL process-start -> first solve: {time.time()-T0:.1f}s",
          flush=True)

    d = aot_cache._cache_dir()
    if d.exists():
        for f in sorted(d.glob("*")):
            mb = f.stat().st_size / 1e6
            if mb > 1:
                print(f"  cache entry {f.name}: {mb:.1f} MB", flush=True)


if __name__ == "__main__":
    main()
