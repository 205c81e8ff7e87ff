"""ssor + fused kernels at BAL scale: does the quality champion get the
kernel speedup too?

tpu_kernel_anatomy.py re-confirmed ssor as the time-to-low-loss champion
(3.96e-3 at 1.8 s vs schur_jacobi+kernels 1.89e-2 at 0.91 s over 12
iters) but its linearize was stuck on the XLA path.  The contribution
kernel now emits the band pair rows (want_od), so ssor can ride it.

Ladder (fixed 8-CG, maxiter in {3, 6, 12}, interleaved):
  ssor lin=xla mv=index   (the previous best quality config)
  ssor lin=index mv=index (new)

Run: cd /root/repo && python experiments/tpu_ssor_kernels.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    from tpu3drecon.benchmark.balscale import bal_sequential_wtt
    from tpu3drecon.problems.wtt import expand_onehots
    from tpu3drecon.solvers.ba_wtt import make_wtt_ba_solver
    from tpu3drecon.solvers.bundle_adjust import BAConfig
    from tpu3drecon.utils.placement import commit

    print("backend:", jax.default_backend(), flush=True)
    problem = commit(expand_onehots(bal_sequential_wtt()))
    jax.device_get(problem.buckets[0].uv[0, 0, 0, 0])

    base = BAConfig(
        maxiter=3, gtol=0.0, ftol=0.0, cg_maxiter=8, cg_rtol=0.0,
        precond="ssor", matvec_kernel="index",
    )
    configs = [
        ("ssor lin=xla", base),
        ("ssor lin=index", base._replace(linearize_kernel="index")),
    ]
    for iters in (3, 6, 12):
        for tag, cfg in configs:
            solver = make_wtt_ba_solver(cfg._replace(maxiter=iters))
            t0 = time.time()
            _, pts, st = solver(problem)  # compile + warm
            jax.block_until_ready(pts)
            compile_s = time.time() - t0
            walls, losses = [], []
            for _ in range(3):
                t0 = time.time()
                _, pts, st = solver(problem)
                jax.block_until_ready(pts)
                losses.append(float(jax.device_get(st.loss)))
                walls.append(time.time() - t0)
            print(f"iters={iters:2d} {tag:14s}: wall {sorted(walls)[1]:6.3f}s "
                  f"({sorted(walls)[1]/iters*1e3:5.1f} ms/LM-iter) loss "
                  f"{losses[-1]:.4e} accepted "
                  f"{int(jax.device_get(st.accepted))}/{iters} "
                  f"(compile+first {compile_s:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
