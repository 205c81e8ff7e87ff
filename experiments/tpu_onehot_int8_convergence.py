"""BAL-scale convergence check: int8 vs bf16 one-hots (round 4).

The fixed-work ladder (experiments/tpu_onehot_dtype.py) measured int8
one-hots 25% faster per LM iteration at BAL scale, but with a different
3-iter loss (the dot pass structure differs by operand dtype, so the f32
accumulation order — and hence the LM trajectory — shifts; same variance
class as the round-3 chunk-budget variants).  This runs the maxiter ladder
on the sequential BAL scene for BOTH encodings: acceptance is that int8
descends to the same loss regime with comparable accepted counts and
gradient reduction.

Run: python experiments/tpu_onehot_int8_convergence.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from tpu3drecon.benchmark.balscale import bal_sequential_wtt
    from tpu3drecon.problems.wtt import expand_onehots
    from tpu3drecon.solvers.ba_wtt import make_wtt_ba_solver
    from tpu3drecon.solvers.bundle_adjust import BAConfig
    from tpu3drecon.utils.placement import commit

    compact = commit(bal_sequential_wtt())
    jax.device_get(compact.buckets[0].uv[0, 0, 0, 0])

    for name, dt in (("bf16", jnp.bfloat16), ("int8", jnp.int8)):
        problem = expand_onehots(compact, onehot_dtype=dt)
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
            print(
                f"{name} maxiter {mi}: wall {time.time()-t0:.1f}s, "
                f"loss {loss:.4e}, "
                f"accepted {int(jax.device_get(state.accepted))}/{mi}, "
                f"grad {float(jax.device_get(state.grad_norm)):.2e}",
                flush=True,
            )
        del problem


if __name__ == "__main__":
    main()
