"""split_windows A/B at BAL scale on the real TPU (fully indexed).

The micro-chunk window-class simulation (wtt_window_stats2.py) predicts
0.511x selection MACs sequential / 0.501x hub, and the round-4b rate
model puts the selection-dot work at ~79% of the 52 ms BAL marginal /
~91% of the hub's 106 ms.  This measures the real thing, interleaved in
one process, marginal rate ((w12 - w3)/9 — dispatch-free):

  A. bal_sequential_wtt()            vs bal_sequential_wtt(split_windows=True)
  B. bal_hub_wtt()                   vs bal_hub_wtt(split_windows=True)

both under the production fully-indexed config (matvec_kernel="index",
linearize_kernel="index", deferred one-hots — the dense one-hot is never
built).  Also reports 12-iter loss for basin sanity and compile time
(more, smaller buckets => more kernel variants).

Run: cd /root/repo && python experiments/tpu_split_windows.py
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
    base = BAConfig(
        maxiter=3, gtol=0.0, ftol=0.0, cg_maxiter=8, cg_rtol=0.0,
        precond="schur_jacobi",
        matvec_kernel="index", linearize_kernel="index",
    )

    def measure(tag, problem):
        stats = [
            (b.window, b.global_tiles, b.uv.shape[0]) for b in problem.buckets
        ]
        macs = sum(
            b.window * b.uv.shape[0] * b.uv.shape[2] * b.uv.shape[3]
            for b in problem.buckets
        )
        print(f"[{tag}] buckets (window, g_tiles, G): {stats} "
              f"sel-MACs {macs/1e9:.2f}G", flush=True)
        problem = commit(problem)
        jax.device_get(problem.buckets[0].uv[0, 0, 0, 0])
        walls = {}
        for iters in (3, 12):
            solver = make_wtt_ba_solver(base._replace(maxiter=iters))
            t0 = time.time()
            _, pts, st = solver(problem)
            jax.block_until_ready(pts)
            compile_s = time.time() - t0
            ws, loss = [], None
            for _ in range(3):
                t0 = time.time()
                _, pts, st = solver(problem)
                jax.block_until_ready(pts)
                loss = float(jax.device_get(st.loss))
                ws.append(time.time() - t0)
            walls[iters] = sorted(ws)[1]
            print(f"[{tag}] iters={iters:2d}: wall {walls[iters]:.3f}s "
                  f"(compile+first {compile_s:.1f}s) loss {loss:.4e} "
                  f"accepted {int(jax.device_get(st.accepted))}/{iters}",
                  flush=True)
        marg = (walls[12] - walls[3]) / 9.0
        print(f"[{tag}] marginal {marg*1e3:.1f} ms/LM-iter", flush=True)
        return marg

    results = {}
    for name, build in [
        ("seq", bal_sequential_wtt),
        ("seq-split", lambda: bal_sequential_wtt(split_windows=True)),
        ("hub", bal_hub_wtt),
        ("hub-split", lambda: bal_hub_wtt(split_windows=True)),
    ]:
        t0 = time.time()
        p = build()
        print(f"{name} ready {time.time()-t0:.1f}s", flush=True)
        results[name] = measure(name, p)
        del p

    print("\nRESULT marginal ms/LM-iter:", flush=True)
    for k, v in results.items():
        print(f"  {k:10s}: {v*1e3:6.1f}", flush=True)
    print(f"  seq ratio {results['seq-split']/results['seq']:.3f}x, "
          f"hub ratio {results['hub-split']/results['hub']:.3f}x", flush=True)


if __name__ == "__main__":
    main()
