"""Interleaved A/B: bf16 CG-matvec plane streaming (BAConfig.matvec_bf16).

The roofline model (experiments/roofline.py) says CG matvec streams are 72%
of BAL bytes/LM-iter and jc/jp planes are ~half of that stream.  bf16-ing
them should buy up to ~20% wall-clock if bandwidth-bound; the question is
step quality (CPU check: identical RMSE floor on the well-conditioned bench
scene, 2.5x worse RMSE at fixed iters on the gauge-weak sequential line).

Measures, in ONE process (only interleaved comparisons are trustworthy):
  - bench scale (tt engine, 30 LM iters): time + final RMSE;
  - BAL scale (wtt engine, 3 LM iters fixed 8-CG): s/LM-iter + loss.

Run: python experiments/tpu_matvec_bf16.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def timed(solver, problem, reps=3):
    import jax

    out = solver(problem)
    jax.block_until_ready(out[1])
    float(jax.device_get(out[2].loss))
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = solver(problem)
        jax.block_until_ready(out[1])
        float(jax.device_get(out[2].loss))
        times.append(time.time() - t0)
    return sorted(times)[len(times) // 2], out


def main():
    import jax

    from tpu3drecon.benchmark.medium_config import BENCH_CONFIG, build_problem
    from tpu3drecon.problems.tt import tt_from_flat
    from tpu3drecon.solvers.ba_tt import make_tt_ba_solver
    from tpu3drecon.solvers.bundle_adjust import reprojection_rmse
    from tpu3drecon.utils.placement import commit

    flat_host = build_problem(on_host=True)
    tt = commit(tt_from_flat(flat_host))
    flat_dev = commit(flat_host)
    for bf16 in (False, True, False):
        cfg = BENCH_CONFIG._replace(matvec_bf16=bf16)
        med, (cams, pts, st) = timed(make_tt_ba_solver(cfg), tt)
        rmse = float(jax.device_get(reprojection_rmse(flat_dev, cams, pts)))
        print(f"[bench] bf16={bf16}: {med:.4f} s, rmse {rmse:.3e}, "
              f"accepted {int(jax.device_get(st.accepted))}", flush=True)
    del tt, flat_dev

    from tpu3drecon.benchmark.balscale import bal_sequential_wtt
    from tpu3drecon.problems.wtt import expand_onehots
    from tpu3drecon.solvers.ba_wtt import make_wtt_ba_solver
    from tpu3drecon.solvers.bundle_adjust import BAConfig
    from tpu3drecon.utils.placement import commit as commit2

    problem = expand_onehots(commit2(bal_sequential_wtt(verbose=False)))
    base = BAConfig(maxiter=3, gtol=0.0, ftol=0.0, cg_maxiter=8, cg_rtol=0.0,
                    precond="schur_jacobi")
    for bf16 in (False, True, False):
        cfg = base._replace(matvec_bf16=bf16)
        med, (cams, pts, st) = timed(make_wtt_ba_solver(cfg), problem)
        print(f"[bal] bf16={bf16}: {med/3:.4f} s/LM-iter, "
              f"loss {float(jax.device_get(st.loss)):.4e}, "
              f"accepted {int(jax.device_get(st.accepted))}/3", flush=True)


if __name__ == "__main__":
    main()
