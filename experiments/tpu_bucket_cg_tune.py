"""Tune bucket bounds x cg budget on the real TPU (whole-solve timings)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import jax

from tpu3drecon.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from tpu3drecon.benchmark.medium_config import BENCH_CONFIG, build_problem, timed_solve
from tpu3drecon.problems.grid import grid_bucketed_from_flat
from tpu3drecon.solvers.ba_pallas import make_pallas_ba_solver
from tpu3drecon.solvers.bundle_adjust import reprojection_rmse

flat = build_problem(on_host=True)
eval_problem = flat

MATRIX = [
    ((2, 4, 8), 8),     # current bench config (reference point)
    ((2, 3, 4, 8), 8),
    ((2, 3, 4, 8), 7),
    ((2, 4, 8), 7),
    ((2, 3, 4, 8), 6),
]

for bounds, cg in MATRIX:
    grid = jax.device_put(grid_bucketed_from_flat(flat, bounds=bounds))
    cfg = BENCH_CONFIG._replace(cg_maxiter=cg)
    solver = make_pallas_ba_solver(cfg)
    try:
        compile_s, run_s, (cams, pts, state) = timed_solve(solver, grid, repeats=2)
        rmse = float(jax.device_get(reprojection_rmse(eval_problem, cams, pts)))
        print(json.dumps({
            "bounds": list(bounds), "cg": cg,
            "run_s": round(run_s, 4), "compile_s": round(compile_s, 1),
            "rmse": float(f"{rmse:.3e}"),
            "accepted": int(jax.device_get(state.accepted)),
        }), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"bounds": list(bounds), "cg": cg, "error": repr(e)[:200]}), flush=True)
