"""Hub split_windows class-cap A/B on the real TPU.

The uncapped hub split (23 window classes) measured 62.6 ms/LM-iter
marginal but 112 s compile+first (experiments/tpu_split_windows.py) vs
26 s / 105.7 ms unsplit.  The exact coalescer keeps most of the MAC win
at far fewer classes (cap 3: 2.00G sel-MACs / 13 buckets; cap 4: 1.97G
/ 16 vs 1.91G / 23 uncapped, 3.87G / 5 unsplit —
experiments/wtt_split_cap_stats.py).  This measures compile+first and
marginal LM-iter rate at caps {3, 4} to pick `_SPLIT_MAX_CLASSES`.

Run: cd /root/repo && python experiments/tpu_split_cap_ab.py [caps...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    from tpu3drecon.benchmark.balscale import bal_hub_wtt
    from tpu3drecon.solvers.ba_wtt import make_wtt_ba_solver
    from tpu3drecon.solvers.bundle_adjust import BAConfig
    from tpu3drecon.utils.placement import commit

    print("backend:", jax.default_backend(), flush=True)
    base = BAConfig(
        maxiter=3, gtol=0.0, ftol=0.0, cg_maxiter=8, cg_rtol=0.0,
        precond="schur_jacobi",
        matvec_kernel="index", linearize_kernel="index",
    )

    def measure(tag, problem):
        print(f"[{tag}] buckets {len(problem.buckets)}: "
              f"{[(b.window, b.global_tiles, b.uv.shape[0]) for b in problem.buckets]}",
              flush=True)
        problem = commit(problem)
        jax.device_get(problem.buckets[0].uv[0, 0, 0, 0])
        walls, compile_s = {}, 0.0
        for iters in (3, 12):
            solver = make_wtt_ba_solver(base._replace(maxiter=iters))
            t0 = time.time()
            _, pts, st = solver(problem)
            # block_until_ready does NOT block through the TPU tunnel
            # (CLAUDE.md trap) — sync via a scalar device_get before
            # reading the clock for the compile+first figure.
            jax.device_get(st.loss)
            c = time.time() - t0
            if iters == 3:
                compile_s = c
            ws, loss = [], None
            for _ in range(3):
                t0 = time.time()
                _, pts, st = solver(problem)
                jax.block_until_ready(pts)
                loss = float(jax.device_get(st.loss))
                ws.append(time.time() - t0)
            walls[iters] = sorted(ws)[1]
            print(f"[{tag}] iters={iters:2d}: wall {walls[iters]:.3f}s "
                  f"(compile+first {c:.1f}s) loss {loss:.4e} "
                  f"accepted {int(jax.device_get(st.accepted))}/{iters}",
                  flush=True)
        marg = (walls[12] - walls[3]) / 9.0
        print(f"[{tag}] marginal {marg*1e3:.1f} ms/LM-iter "
              f"compile+first {compile_s:.1f}s", flush=True)
        return marg, compile_s

    caps = [int(a) for a in sys.argv[1:]] or [3, 4]
    results = {}
    for cap in caps:
        t0 = time.time()
        p = bal_hub_wtt(split_windows=cap)
        print(f"hub cap={cap} ready {time.time()-t0:.1f}s", flush=True)
        results[cap] = measure(f"hub-c{cap}", p)
        del p

    print("\nRESULT (hub): cap -> marginal ms/LM-iter, compile+first s",
          flush=True)
    print("  unsplit : 105.7, 26.3   (this session, tpu_split_windows.py)",
          flush=True)
    print("  uncapped:  62.6, 111.9  (this session, tpu_split_windows.py)",
          flush=True)
    for cap, (marg, comp) in results.items():
        print(f"  cap {cap:2d}  : {marg*1e3:6.1f}, {comp:.1f}", flush=True)


if __name__ == "__main__":
    main()
