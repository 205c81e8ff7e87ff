"""Hub split-window class-cap ladder: does a larger cap cut sel-MACs now
that classes carry PER-CLASS global-tile hulls?

Round-5 state: hub-split cap 4 = 43.7 ms/LM-iter vs sequential-split
30.0 (ratio 1.46x; the verdict's ratio bar was 1.45x).  The cap-4 pick
predates the per-class hulls — with hulls, extra bins can separate
narrow-hull classes from wide-hull ones, so a larger cap may reduce
selection MACs where it used to only add kernel variants (compile is
AOT-amortized in production).

Phase 1 (``--macs``, CPU-safe): pack ``bal_hub_wtt(split_windows=c)``
for each cap and print bucket stats + total selection MACs — no TPU.
Phase 2 (default, real TPU): interleaved marginal rate (w12-w3)/9 for
the caps whose MACs differ, production fully-indexed config.

Run: cd /root/repo && python experiments/tpu_hub_cap_ladder.py [--macs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sel_macs(problem) -> float:
    return sum(
        b.window * b.uv.shape[0] * b.uv.shape[2] * b.uv.shape[3]
        for b in problem.buckets
    )


def main() -> None:
    macs_only = "--macs" in sys.argv
    caps = [int(a) for a in sys.argv[1:] if a.isdigit()] or [4, 6, 8, 12]

    if macs_only:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from tpu3drecon.benchmark.balscale import bal_hub_wtt
    from tpu3drecon.solvers.ba_wtt import make_wtt_ba_solver
    from tpu3drecon.solvers.bundle_adjust import BAConfig
    from tpu3drecon.utils.placement import commit

    print("backend:", jax.default_backend(), flush=True)

    problems = {}
    for cap in caps:
        p = bal_hub_wtt(split_windows=cap, verbose=False)
        stats = [
            (b.window, b.global_tiles, b.uv.shape[0]) for b in p.buckets
        ]
        print(
            f"[cap {cap:2d}] buckets {len(p.buckets):2d} "
            f"sel-MACs {sel_macs(p)/1e9:.3f}G  (window, g_tiles, G): {stats}",
            flush=True,
        )
        if not macs_only:  # macs mode: don't hold every packing in RAM
            problems[cap] = p
        del p
    if macs_only:
        return

    base = BAConfig(
        maxiter=3, gtol=0.0, ftol=0.0, cg_maxiter=8, cg_rtol=0.0,
        precond="schur_jacobi",
        matvec_kernel="index", linearize_kernel="index",
    )

    def measure(tag, problem):
        problem = commit(problem)
        jax.device_get(problem.buckets[0].uv[0, 0, 0, 0])
        walls, compile_s = {}, 0.0
        for iters in (3, 12):
            solver = make_wtt_ba_solver(base._replace(maxiter=iters))
            t0 = time.time()
            _, pts, st = solver(problem)
            jax.device_get(st.loss)  # sync (tunnel trap)
            c = time.time() - t0
            if iters == 3:
                compile_s = c
            ws, loss = [], None
            for _ in range(3):
                t0 = time.time()
                _, pts, st = solver(problem)
                loss = float(jax.device_get(st.loss))
                ws.append(time.time() - t0)
            walls[iters] = sorted(ws)[1]
            print(f"[{tag}] iters={iters:2d}: wall {walls[iters]:.3f}s "
                  f"(compile+first {c:.1f}s) loss {loss:.4e}", flush=True)
        marg = (walls[12] - walls[3]) / 9.0
        print(f"[{tag}] marginal {marg*1e3:.1f} ms/LM-iter", flush=True)
        return marg

    results = {c: measure(f"cap {c}", p) for c, p in problems.items()}
    print("\n=== hub cap ladder (marginal ms/LM-iter) ===")
    for c, m in results.items():
        print(f"  cap {c:2d}: {m*1e3:6.1f}")


if __name__ == "__main__":
    main()
