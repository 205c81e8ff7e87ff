"""Track-table engine: cg_maxiter sweep on the medium bench (one process).

Picks the bench config: extra CG iterations are cheap in the tt engine, so
find the knee where RMSE stops improving.  Run on the TPU host:

    python experiments/tpu_tt_cg_sweep.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

from tpu3drecon.benchmark.medium_config import BENCH_CONFIG, build_problem


def sync(out):
    jax.block_until_ready(out)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])


def main():
    from tpu3drecon.problems.tt import tt_from_flat
    from tpu3drecon.solvers.ba_tt import make_tt_ba_solver
    from tpu3drecon.solvers.bundle_adjust import reprojection_rmse

    flat_host = build_problem(on_host=True)
    tt_problem = jax.device_put(tt_from_flat(flat_host))
    eval_problem = build_problem(on_host=True)

    results = []
    for cg in (6, 8, 10, 12):
        config = BENCH_CONFIG._replace(cg_maxiter=cg)
        solver = make_tt_ba_solver(config)
        t0 = time.perf_counter()
        out = solver(tt_problem)
        sync(out)
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = solver(tt_problem)
            sync(out)
            best = min(best, time.perf_counter() - t0)
        cams, pts, state = out
        rmse = float(jax.device_get(reprojection_rmse(eval_problem, cams, pts)))
        results.append({
            "cg": cg,
            "run_s": round(best, 4),
            "rmse": float(f"{rmse:.4e}"),
            "accepted": int(jax.device_get(state.accepted)),
            "compile_s": round(compile_s, 1),
        })
        print(json.dumps(results[-1]), flush=True)

    print(json.dumps({"sweep": results, "backend": jax.default_backend()}))


if __name__ == "__main__":
    main()
