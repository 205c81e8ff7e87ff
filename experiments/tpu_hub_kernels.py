"""Hub-structured BAL scale with the full index-kernel set.

Round-4 recorded hub at 0.266 s/LM-iter XLA and 0.185 with the index
matvec (ratio 1.43x vs sequential).  This re-measures with the FULL
kernel complement (matvec + contribution + cost + rhs + backsub +
cam-planes, deferred one-hots) — the hub's wide global window (W up to
~1664) multiplies one-hot MACs, so the byte/term savings matter more
there.  Interleaved sequential vs hub, marginal rates via maxiter 3/12.

Run: cd /root/repo && python experiments/tpu_hub_kernels.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    from tpu3drecon.benchmark.balscale import bal_hub_wtt, bal_sequential_wtt
    from tpu3drecon.solvers.ba_wtt import make_wtt_ba_solver
    from tpu3drecon.solvers.bundle_adjust import BAConfig
    from tpu3drecon.utils.placement import commit

    print("backend:", jax.default_backend(), flush=True)
    problems = {
        "seq": commit(bal_sequential_wtt()),
        "hub": commit(bal_hub_wtt()),
    }
    base = BAConfig(
        maxiter=3, gtol=0.0, ftol=0.0, cg_maxiter=8, cg_rtol=0.0,
        precond="schur_jacobi", matvec_kernel="index",
        linearize_kernel="index",
    )
    walls = {}
    for tag, problem in problems.items():
        for b in problem.buckets:
            print(f"  {tag} bucket: uv {tuple(b.uv.shape)} window "
                  f"{b.window} global_tiles {b.global_tiles}", flush=True)
        for iters in (3, 12):
            solver = make_wtt_ba_solver(base._replace(maxiter=iters))
            _, pts, st = solver(problem)
            jax.block_until_ready(pts)
            ws = []
            for _ in range(3):
                t0 = time.time()
                _, pts, st = solver(problem)
                jax.block_until_ready(pts)
                float(jax.device_get(st.loss))
                ws.append(time.time() - t0)
            walls[(tag, iters)] = sorted(ws)[1]
            print(f"{tag} iters={iters:2d}: wall {sorted(ws)[1]:.3f}s loss "
                  f"{float(jax.device_get(st.loss)):.4e} accepted "
                  f"{int(jax.device_get(st.accepted))}/{iters}", flush=True)
    for tag in problems:
        m = (walls[(tag, 12)] - walls[(tag, 3)]) / 9.0 * 1e3
        print(f"marginal {tag}: {m:.1f} ms/LM-iter", flush=True)
    ratio = (walls[("hub", 12)] - walls[("hub", 3)]) / (
        walls[("seq", 12)] - walls[("seq", 3)]
    )
    print(f"hub/seq marginal ratio: {ratio:.2f}x", flush=True)


if __name__ == "__main__":
    main()
