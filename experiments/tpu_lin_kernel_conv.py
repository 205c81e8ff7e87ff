"""Convergence sanity: fused lin kernel vs XLA at BAL scale, 10 LM iters.

The 3-iter A/B (tpu_lin_kernel_ab.py) showed trajectory divergence within
the documented f32 variance class (losses 0.337 vs 0.140 after 3 iters).
This runs 10 iters of each config and checks both reach the same optimum
basin.  Run: python experiments/tpu_lin_kernel_conv.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import jax

    from tpu3drecon.benchmark.balscale import bal_sequential_wtt
    from tpu3drecon.problems.wtt import expand_onehots
    from tpu3drecon.solvers.ba_wtt import make_wtt_ba_solver
    from tpu3drecon.solvers.bundle_adjust import BAConfig
    from tpu3drecon.utils.placement import commit

    print("backend:", jax.default_backend(), flush=True)
    problem = expand_onehots(commit(bal_sequential_wtt()))
    base = BAConfig(
        maxiter=10, gtol=0.0, ftol=0.0, cg_maxiter=8, cg_rtol=0.0,
        precond="schur_jacobi",
    )
    ladder = [
        ("xla", base),
        ("mv=index lin=off", base._replace(matvec_kernel="index")),
        ("mv=index lin=index", base._replace(
            matvec_kernel="index", linearize_kernel="index")),
    ]
    for tag, cfg in ladder:
        solver = make_wtt_ba_solver(cfg)
        t0 = time.time()
        cams_o, pts_o, state = solver(problem)
        jax.block_until_ready(pts_o)
        loss = float(jax.device_get(state.loss))
        print(f"RESULT {tag}: loss {loss:.6e} accepted "
              f"{int(jax.device_get(state.accepted))}/10 "
              f"wall {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
