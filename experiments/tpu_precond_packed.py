"""TPU experiment: preconditioner x packed-gathers x cg budget on the bench
problem.  Whole-solve timings only (tunnel dispatch overhead makes
standalone-op microbenchmarks meaningless — CLAUDE.md)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import jax

from tpu3drecon.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from tpu3drecon.benchmark.medium_config import BENCH_CONFIG, build_grid_problem, build_problem, timed_solve
from tpu3drecon.solvers.ba_pallas import make_pallas_ba_solver
from tpu3drecon.solvers.bundle_adjust import reprojection_rmse

problem = build_grid_problem()
eval_problem = build_problem(on_host=True)

# Round 2 batch 3: tight buckets (2,4,8) + fused coupling kernel.
MATRIX = [
    ("jacobi_u", 12, False),    # round-1 config on tight buckets
    ("schur_jacobi", 8, False),
    ("schur_jacobi", 6, False),
    ("schur_jacobi", 4, False),
    ("jacobi_u", 1, False),     # fixed-cost floor
    ("schur_jacobi", 1, False), # floor + fused precond cost
]

for precond, cg, packed in MATRIX:
    cfg = BENCH_CONFIG._replace(
        precond=precond, cg_maxiter=cg, packed_gathers=packed
    )
    solver = make_pallas_ba_solver(cfg)
    try:
        compile_s, run_s, (cams, pts, state) = timed_solve(solver, problem, repeats=2)
        rmse = float(jax.device_get(reprojection_rmse(eval_problem, cams, pts)))
        print(json.dumps({
            "precond": precond, "cg": cg, "packed": packed,
            "run_s": round(run_s, 4), "compile_s": round(compile_s, 1),
            "rmse": float(f"{rmse:.3e}"),
            "accepted": int(jax.device_get(state.accepted)),
        }), flush=True)
    except Exception as e:  # noqa: BLE001 - keep the batch going
        print(json.dumps({"precond": precond, "cg": cg, "packed": packed,
                          "error": repr(e)[:200]}), flush=True)
