"""Post-kernel BAL anatomy + precond auto re-check (round 4b).

With both index kernels on (matvec + linearize) the BAL solve dropped to
~0.102 s/LM-iter.  Two questions this answers in one TPU session:

1. **Where do the remaining milliseconds live?**  cg_maxiter ladder
   (dynamic operand -> one executable, interleaved) fit
   s/LM-iter = intercept + slope * cg_iters, compared against the
   roofline floors (slope floor ~ matvec bytes / 819 GB/s; intercept
   floor ~ linearize + cost + rhs/backsub bytes).

2. **Is the CLI auto-precond (ssor at >=1000 cams) still right?**  The
   ssor/tridiag band preconditioners force the XLA linearize (the fused
   kernel has no band pair rows), so their round-3 "2x faster to every
   loss target" verdict must be re-measured against schur_jacobi + both
   kernels.  Fixed 8-CG solves at maxiter in {3, 6, 12} give
   (wall, loss) curves per config.

Run: cd /root/repo && python experiments/tpu_kernel_anatomy.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
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

    # --- 1. CG ladder with both kernels -------------------------------
    lm_iters = 3
    ladder = [1, 2, 4, 8, 16]
    base = BAConfig(
        maxiter=lm_iters, gtol=0.0, ftol=0.0, cg_rtol=0.0,
        precond="schur_jacobi", matvec_kernel="index",
        linearize_kernel="index",
    )
    solvers = {cg: make_wtt_ba_solver(base._replace(cg_maxiter=cg))
               for cg in ladder}
    for cg, s in solvers.items():
        t0 = time.time()
        _, pts, st = s(problem)
        jax.block_until_ready(pts)
        float(jax.device_get(st.loss))
        print(f"compile cg={cg}: {time.time()-t0:.1f}s", flush=True)
    times = {cg: [] for cg in ladder}
    for _ in range(5):
        for cg, s in solvers.items():
            t0 = time.time()
            _, pts, st = s(problem)
            jax.block_until_ready(pts)
            float(jax.device_get(st.loss))
            times[cg].append((time.time() - t0) / lm_iters)
    med = {cg: sorted(ts)[len(ts) // 2] for cg, ts in times.items()}
    xs = np.array(ladder, float)
    ys = np.array([med[cg] for cg in ladder])
    slope, intercept = np.polyfit(xs, ys, 1)
    print("\nCG ladder (both kernels, s/LM-iter):", flush=True)
    for cg in ladder:
        print(f"  cg={cg:3d}: {med[cg]*1e3:7.1f} ms", flush=True)
    print(f"  fit: intercept {intercept*1e3:.1f} ms + "
          f"{slope*1e3:.2f} ms/CG-iter", flush=True)

    # --- 2. precond ladder: loss-vs-wall ------------------------------
    print("\nprecond ladder (fixed 8-CG, wall measured per solve):",
          flush=True)
    configs = [
        ("sj+kernels", base._replace(cg_maxiter=8)),
        ("sj+xla", base._replace(
            cg_maxiter=8, matvec_kernel=False, linearize_kernel=False)),
        ("ssor+xla(+mv)", base._replace(
            cg_maxiter=8, precond="ssor", linearize_kernel=False)),
    ]
    for iters in (3, 6, 12):
        for tag, cfg in configs:
            solver = make_wtt_ba_solver(cfg._replace(maxiter=iters))
            _, pts, st = solver(problem)  # compile + warm
            jax.block_until_ready(pts)
            walls, losses = [], []
            for _ in range(3):
                t0 = time.time()
                _, pts, st = solver(problem)
                jax.block_until_ready(pts)
                losses.append(float(jax.device_get(st.loss)))
                walls.append(time.time() - t0)
            print(f"  iters={iters:2d} {tag:14s}: wall "
                  f"{sorted(walls)[1]:6.3f}s loss {losses[-1]:.4e} "
                  f"accepted {int(jax.device_get(st.accepted))}/{iters}",
                  flush=True)


if __name__ == "__main__":
    main()
