"""Interleaved A/B: SCHUR_JACOBI vs TRIDIAG vs SSOR preconditioner (tt).

VERDICT round-2 item #4: sequential captures give S band structure; does
the exact block-tridiagonal preconditioner (solvers/tridiag.py) cut CG
iterations enough to beat its own build+apply cost?  cg_maxiter is a
DYNAMIC operand, so each engine compiles once and the cg sweep is free.

Run: cd /root/repo && python experiments/tpu_tt_tridiag.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LM_ITERS = 30


def main(reps: int = 3, bench: bool = False) -> None:
    import jax

    from tpu3drecon.dataset.synthetic import (
        make_sequential_scene,
        perturb_scene,
        scene_to_ba_problem,
    )
    from tpu3drecon.problems.tt import tt_from_flat
    from tpu3drecon.solvers.ba_tt import make_tt_ba_solver
    from tpu3drecon.solvers.bundle_adjust import BAConfig, reprojection_rmse
    from tpu3drecon.utils.placement import commit
    from tpu3drecon.utils.timing import device_sync

    print("backend:", jax.default_backend(), flush=True)
    if bench:
        from tpu3drecon.benchmark.medium_config import build_problem

        flat = build_problem(on_host=True)
        label = "bench scene: 100 cams"
    else:
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            scene = make_sequential_scene(
                n_cameras=256, points_per_camera=400, track_span=4, seed=33
            )
            noisy = perturb_scene(scene, seed=34, point2d_noise=0.5)
            flat, _ = scene_to_ba_problem(noisy, observed=scene)
        label = "sequential scene: 256 cams"
    problem = commit(tt_from_flat(flat))
    n_obs = int(sum(float(b.mask.sum()) for b in problem.buckets))
    print(f"{label}, {n_obs} obs", flush=True)

    def cfg(precond, cg):
        return BAConfig(
            maxiter=LM_ITERS, gtol=0.0, ftol=0.0, cg_maxiter=cg,
            cg_rtol=1e-6, precond=precond,
        )

    preconds = ("schur_jacobi", "tridiag", "ssor")
    # One compile per precond (cg_maxiter/rtol are dynamic operands).
    for precond in preconds:
        t0 = time.perf_counter()
        out = make_tt_ba_solver(cfg(precond, 8))(problem)
        device_sync(out[2].loss)
        print(f"{precond}: compile {time.perf_counter() - t0:.1f}s", flush=True)

    for cg in (3, 4, 5, 6, 8, 12):
        rows = {}
        for precond in preconds:
            name = precond
            solver = make_tt_ba_solver(cfg(precond, cg))
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                out = solver(problem)
                device_sync(out[2].loss)
                ts.append(time.perf_counter() - t0)
            cams, pts, state = out
            rmse = float(jax.device_get(reprojection_rmse(flat, cams, pts)))
            rows[name] = (min(ts), rmse, int(jax.device_get(state.accepted)))
        for name, (t, rmse, acc) in rows.items():
            print(
                f"cg={cg:2d} {name:12s} best {t:.4f}s rmse {rmse:.3e} "
                f"accepted {acc}",
                flush=True,
            )


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--bench"]
    main(int(args[0]) if args else 3, bench="--bench" in sys.argv[1:])
