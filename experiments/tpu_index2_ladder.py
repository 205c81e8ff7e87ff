"""index2 (2-term split) ladder at BAL scale: marginal rate + loss sanity.

The fixed-block decomposition (tpu_fixed_phases.py) put ~1.1 ms/matvec
per bf16 split term; dropping the third term (~1e-5 operator fidelity)
should cut ~9 ms/LM-iter out of the 8-CG block plus a slice of the
linearize.  Measures wall at maxiter 3 and 12 (marginal rate =
(w12 - w3)/9, dispatch-free) and the 12-iter loss for basin sanity.

Run: cd /root/repo && python experiments/tpu_index2_ladder.py [--split]

--split packs with micro-chunk window classes (round 4c's production
default) so the ladder's numbers match the shipped configuration.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    from tpu3drecon.benchmark.balscale import bal_sequential_wtt
    from tpu3drecon.solvers.ba_wtt import make_wtt_ba_solver
    from tpu3drecon.solvers.bundle_adjust import BAConfig
    from tpu3drecon.utils.placement import commit

    print("backend:", jax.default_backend(), flush=True)
    # All ladder configs are fully indexed: the dense one-hot is never
    # read, so the problem stays DEFERRED (wcam only) — also proves the
    # deferred path at BAL scale on the real TPU.
    split = "--split" in sys.argv
    print("split_windows:", split, flush=True)
    problem = commit(bal_sequential_wtt(split_windows=split))
    jax.device_get(problem.buckets[0].uv[0, 0, 0, 0])

    base = BAConfig(
        maxiter=3, gtol=0.0, ftol=0.0, cg_maxiter=8, cg_rtol=0.0,
        precond="schur_jacobi",
    )
    ladder = [
        ("mv=index lin=index", base._replace(
            matvec_kernel="index", linearize_kernel="index")),
        ("mv=index2 lin=index2", base._replace(
            matvec_kernel="index2", linearize_kernel="index2")),
        ("mv=index1 lin=index2", base._replace(
            matvec_kernel="index1", linearize_kernel="index2")),
    ]
    walls = {}
    for tag, cfg in ladder:
        for iters in (3, 12):
            solver = make_wtt_ba_solver(cfg._replace(maxiter=iters))
            _, pts, st = solver(problem)  # compile + warm
            jax.block_until_ready(pts)
            ws, losses = [], []
            for _ in range(3):
                t0 = time.time()
                _, pts, st = solver(problem)
                jax.block_until_ready(pts)
                losses.append(float(jax.device_get(st.loss)))
                ws.append(time.time() - t0)
            walls[(tag, iters)] = sorted(ws)[1]
            print(f"{tag:22s} iters={iters:2d}: wall {sorted(ws)[1]:.3f}s "
                  f"loss {losses[-1]:.4e} accepted "
                  f"{int(jax.device_get(st.accepted))}/{iters}", flush=True)
    print("\nmarginal ms/LM-iter ((w12-w3)/9):", flush=True)
    for tag, _ in ladder:
        m = (walls[(tag, 12)] - walls[(tag, 3)]) / 9.0 * 1e3
        print(f"  {tag:22s}: {m:6.1f} ms", flush=True)


if __name__ == "__main__":
    main()
