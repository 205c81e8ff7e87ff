"""Pure engine timing at bench scale (fixed work): grid | pallas | flat.

Probe for the tiny-contraction einsum conversion in solvers/ba_grid.py:
the engine is full of length-2/3 dot_generals (rotation applications,
W-cell products, matvec contractions) of the kind measured 2.9x slow in
the wtt engine.  Run once before and once after the conversion in the
same TPU session (cross-session drift ~±10%).

Run: cd /root/repo && python experiments/tpu_grid_engine_bench.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(engine: str = "grid") -> None:
    import jax

    from tpu3drecon.benchmark.medium_config import (
        BENCH_CONFIG,
        build_problem,
        timed_solve_stats,
    )
    from tpu3drecon.utils.placement import commit

    print("backend:", jax.default_backend(), "engine:", engine, flush=True)
    flat_host = build_problem(on_host=True)
    cfg = BENCH_CONFIG._replace(cg_rtol=0.0)  # fixed work: 8 CG iters always
    if engine == "grid":
        from tpu3drecon.problems.grid import grid_from_flat
        from tpu3drecon.solvers.ba_grid import make_grid_ba_solver

        grid = commit(grid_from_flat(flat_host))
        solver = make_grid_ba_solver(cfg)
    elif engine == "pallas":
        from tpu3drecon.problems.grid import grid_bucketed_from_flat
        from tpu3drecon.solvers.ba_pallas import make_pallas_ba_solver

        grid = commit(grid_bucketed_from_flat(flat_host))
        solver = make_pallas_ba_solver(cfg)
    else:
        from tpu3drecon.solvers.bundle_adjust import make_ba_solver

        grid = commit(flat_host)
        solver = make_ba_solver(cfg)
    compile_s, times, out = timed_solve_stats(solver, grid, repeats=5)
    ts = sorted(times)
    print(json.dumps({
        "mode": f"{engine}_engine_bench", "compile_s": round(compile_s, 1),
        "best_s": round(ts[0], 4), "median_s": round(ts[len(ts) // 2], 4),
        "loss": float(jax.device_get(out[2].loss)),
        "accepted": int(jax.device_get(out[2].accepted)),
    }), flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "grid")
