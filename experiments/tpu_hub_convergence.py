"""Hub-structured BAL-scale CONVERGENCE proof (round 4).

The A/B (experiments/tpu_hub_bal.py) measured s/LM-iter at fixed work;
this shows the hub problem actually CONVERGES from its 0.5 px-noised
perturbed initialization: a maxiter ladder on one compile (loop bounds are
dynamic operands), loss + accepted counts per rung.

Run: python experiments/tpu_hub_convergence.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import jax

    from tpu3drecon.benchmark.balscale import bal_hub_wtt
    from tpu3drecon.problems.wtt import expand_onehots
    from tpu3drecon.solvers.ba_wtt import make_wtt_ba_solver
    from tpu3drecon.solvers.bundle_adjust import BAConfig
    from tpu3drecon.utils.placement import commit

    problem = expand_onehots(commit(bal_hub_wtt(verbose=True)))
    for mi in (3, 10, 25):
        cfg = BAConfig(
            maxiter=mi, gtol=0.0, ftol=0.0, cg_maxiter=8, cg_rtol=1e-6,
            precond="schur_jacobi",
        )
        solver = make_wtt_ba_solver(cfg)
        t0 = time.time()
        cams, pts, state = solver(problem)
        jax.block_until_ready(pts)
        loss = float(jax.device_get(state.loss))
        print(f"maxiter {mi}: wall {time.time()-t0:.1f}s, loss {loss:.4e}, "
              f"accepted {int(jax.device_get(state.accepted))}/{mi}, "
              f"grad {float(jax.device_get(state.grad_norm)):.2e}", flush=True)


if __name__ == "__main__":
    main()
