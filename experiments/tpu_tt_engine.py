"""Interleaved A/B: track-table engine vs pallas engine on the medium bench.

Session-level TPU throughput drifts ~±10% (RESULTS.md), so this measures
both engines alternately in ONE process.  Run on the TPU host:

    python experiments/tpu_tt_engine.py [reps]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

from tpu3drecon.benchmark.medium_config import (
    BENCH_CONFIG,
    build_grid_problem,
    build_problem,
    timed_solve,
)


def sync(out):
    jax.block_until_ready(out)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from tpu3drecon.problems.tt import tt_from_flat
    from tpu3drecon.solvers.ba_pallas import make_pallas_ba_solver
    from tpu3drecon.solvers.ba_tt import make_tt_ba_solver
    from tpu3drecon.solvers.bundle_adjust import reprojection_rmse

    flat_host = build_problem(on_host=True)
    tt_problem = jax.device_put(tt_from_flat(flat_host))
    grid_problem = build_grid_problem()

    tt_solver = make_tt_ba_solver(BENCH_CONFIG)
    pl_solver = make_pallas_ba_solver(BENCH_CONFIG)

    t0 = time.perf_counter()
    out_tt = tt_solver(tt_problem)
    sync(out_tt)
    compile_tt = time.perf_counter() - t0
    t0 = time.perf_counter()
    out_pl = pl_solver(grid_problem)
    sync(out_pl)
    compile_pl = time.perf_counter() - t0

    times = {"tt": [], "pallas": []}
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(tt_solver(tt_problem))
        times["tt"].append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        sync(pl_solver(grid_problem))
        times["pallas"].append(time.perf_counter() - t0)

    eval_problem = build_problem(on_host=True)
    cams_t, pts_t, st_t = out_tt
    cams_p, pts_p, st_p = out_pl
    rmse_tt = float(jax.device_get(reprojection_rmse(eval_problem, cams_t, pts_t)))
    rmse_pl = float(jax.device_get(reprojection_rmse(eval_problem, cams_p, pts_p)))

    print(json.dumps({
        "tt_best_s": round(min(times["tt"]), 4),
        "pallas_best_s": round(min(times["pallas"]), 4),
        "tt_all": [round(t, 4) for t in times["tt"]],
        "pallas_all": [round(t, 4) for t in times["pallas"]],
        "compile_tt_s": round(compile_tt, 1),
        "compile_pallas_s": round(compile_pl, 1),
        "rmse_tt": float(f"{rmse_tt:.4e}"),
        "rmse_pallas": float(f"{rmse_pl:.4e}"),
        "accepted_tt": int(jax.device_get(st_t.accepted)),
        "accepted_pallas": int(jax.device_get(st_p.accepted)),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
