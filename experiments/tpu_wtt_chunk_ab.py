"""Interleaved A/B over the wtt linearization chunk budget at BAL scale.

The batched (diagonal-slice) linearization killed the compile wall
(~22 s vs ~330-650 s) but costs ~+42 ms/LM-iter over the old unrolled
program (0.174 vs 0.132, fixed 8-iteration CG).  The chunk budget
(TPU3DRECON_PLANE_BYTES -> solvers/ba_wtt.py::_contrib_g_chunk) sets how
much transient plane memory one contribution chunk may use: more chunks =
more concat copies + smaller dots; fewer chunks = bigger transients.
This sweeps the budget in ONE process (TPU drifts ±10% across sessions,
so only interleaved numbers are comparable).

Run: cd /root/repo && python experiments/tpu_wtt_chunk_ab.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUDGETS = [300_000_000, 1_200_000_000, 2_400_000_000, 4_800_000_000]


def main(reps: int = 4) -> None:
    import jax

    import tpu3drecon.solvers.ba_wtt as ba_wtt
    from tpu3drecon.problems.wtt import expand_onehots
    from tpu3drecon.solvers.bundle_adjust import BAConfig
    from tpu3drecon.utils.placement import commit

    print("backend:", jax.default_backend(), flush=True)

    from tpu3drecon.benchmark.balscale import bal_sequential_wtt

    wtt = bal_sequential_wtt()
    wtt = expand_onehots(commit(wtt))
    jax.device_get(wtt.buckets[0].uv[0, 0, 0, 0])

    # Fixed-work solve: 3 LM iters, exactly 8 CG iterations each.
    config = BAConfig(maxiter=3, gtol=0.0, ftol=0.0, cg_maxiter=8, cg_rtol=0.0)

    solvers = {}
    for budget in BUDGETS:
        # Through the supported override (read at trace time), so the sweep
        # also exercises the production env-var plumbing.
        os.environ["TPU3DRECON_PLANE_BYTES"] = str(budget)
        fn = jax.jit(lambda p, c=config: ba_wtt.ba_solve_wtt(p, c)[2].loss)
        t0 = time.time()
        try:
            loss = float(jax.device_get(fn(wtt)))
        except Exception as e:
            print(f"budget {budget/1e9:.1f}GB: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            continue
        print(
            f"budget {budget/1e9:.1f}GB: compile+first {time.time()-t0:.1f}s "
            f"loss {loss:.6f}", flush=True,
        )
        solvers[budget] = fn

    times = {b: [] for b in solvers}
    for _ in range(reps):
        for b, fn in solvers.items():
            t0 = time.time()
            jax.device_get(fn(wtt))
            times[b].append(time.time() - t0)
    for b in solvers:
        ts = sorted(times[b])
        print(
            f"budget {b/1e9:.1f}GB: best {ts[0]:.3f}s "
            f"median {ts[len(ts)//2]:.3f}s  s/LM-iter {ts[0]/3:.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
