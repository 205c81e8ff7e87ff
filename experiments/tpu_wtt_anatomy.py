"""Where do the non-roofline milliseconds live in a BAL wtt LM iteration?

Round-4 finding: int8 one-hots cut modeled bytes 1.62x but wall only
1.30x — at 0.1141 s/LM-iter the solve sits at 38% of the HBM floor, so
~25 ms/iter is NOT stream traffic.  This experiment separates the
per-CG-matvec cost from the fixed per-LM-iteration cost by sweeping
``cg_maxiter`` (a DYNAMIC operand — one executable serves the whole
ladder, so every rung is the same program measured interleaved) and
fitting s/LM-iter = intercept + slope * cg_iters.

Model comparison comes from experiments/roofline.py's byte accounting:
  slope  ~ matvec bytes/(8 * 819 GB/s)   (per-matvec HBM floor)
  intercept ~ (total - matvec bytes)/819 GB/s  (lin + rhs + backsub + cost)
Whichever term carries the bigger multiple over its floor is the next
single-chip lever (kernel scheduling / small-op latency vs stream
compression).

Run: cd /root/repo && python experiments/tpu_wtt_anatomy.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(reps: int = 5) -> None:
    import numpy as np

    import jax

    from tpu3drecon.benchmark.balscale import bal_sequential_wtt
    from tpu3drecon.problems.wtt import expand_onehots
    from tpu3drecon.solvers.ba_wtt import make_wtt_ba_solver
    from tpu3drecon.solvers.bundle_adjust import BAConfig
    from tpu3drecon.utils.placement import commit

    print("backend:", jax.default_backend(), flush=True)

    problem = commit(expand_onehots(bal_sequential_wtt()))
    jax.device_get(problem.buckets[0].uv[0, 0, 0, 0])

    lm_iters = 3
    ladder = [1, 2, 4, 8, 16]
    base = BAConfig(maxiter=lm_iters, gtol=0.0, ftol=0.0, cg_rtol=0.0)
    solvers = {cg: make_wtt_ba_solver(base._replace(cg_maxiter=cg))
               for cg in ladder}

    # First pass compiles once (cg_maxiter is dynamic; all rungs share the
    # executable) and warms every rung.
    for cg in ladder:
        t0 = time.time()
        loss = float(jax.device_get(solvers[cg](problem)[2].loss))
        print(f"cg={cg:3d}: first {time.time()-t0:6.1f}s loss {loss:.4e}",
              flush=True)

    times = {cg: [] for cg in ladder}
    for _ in range(reps):
        for cg in ladder:
            t0 = time.time()
            jax.device_get(solvers[cg](problem)[2].loss)
            times[cg].append(time.time() - t0)

    xs, ys = [], []
    for cg in ladder:
        ts = sorted(times[cg])
        per_iter = ts[0] / lm_iters
        xs.append(cg)
        ys.append(per_iter)
        print(f"cg={cg:3d}: best {ts[0]:.3f}s median {ts[len(ts)//2]:.3f}s "
              f"s/LM-iter {per_iter:.4f}", flush=True)

    slope, intercept = np.polyfit(np.array(xs, float), np.array(ys, float), 1)
    print(f"\nfit: s/LM-iter = {intercept*1e3:.1f} ms + {slope*1e3:.2f} ms * cg_iters",
          flush=True)

    # Roofline floors for the same problem (bytes model from roofline.py).
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from roofline import wtt_model, HBM_GBPS  # noqa: E402 (experiments dir)

    items, _ = wtt_model(problem, cg_iters=8)
    matvec = items["cg: matvec streams"]
    rest = sum(items.values()) - matvec
    slope_floor = matvec / 8 / (HBM_GBPS * 1e9)
    icept_floor = rest / (HBM_GBPS * 1e9)
    print(f"model floors: intercept {icept_floor*1e3:.1f} ms "
          f"({rest/1e9:.1f} GB), slope {slope_floor*1e3:.2f} ms/matvec "
          f"({matvec/8/1e9:.2f} GB)", flush=True)
    print(f"multiples over floor: intercept {intercept/icept_floor:.2f}x, "
          f"slope {slope/slope_floor:.2f}x", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5)
