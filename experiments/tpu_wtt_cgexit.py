"""Does BAL-scale wtt PCG exit early (breakdown/NaN) at cg_maxiter=8?

The anatomy ladder (experiments/tpu_wtt_anatomy.py) measured cg ∈
{1,2,4,16} on a perfect line (88.6 + 7.5·cg ms/LM-iter) but cg=8 at 106 ms
instead of the predicted 141 ms — and the cg=8 trajectory's 3-iter loss is
WORSE than cg=4's (5.63 vs 0.77, 1/3 vs more accepted).  pcg()'s loop
condition is ``i < maxiter AND dot(r,r) > tol2`` with tol2=0 here: an
exactly-zero or NaN residual exits early AND returns a useless step.  This
prints the final-iteration CG count and the accept/loss trace for
maxiter = 1..6 (maxiter is a dynamic operand — one executable).

Run: cd /root/repo && python experiments/tpu_wtt_cgexit.py
"""

import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    import jax

    from tpu3drecon.benchmark.balscale import bal_sequential_wtt
    from tpu3drecon.problems.wtt import expand_onehots
    from tpu3drecon.solvers.ba_wtt import make_wtt_ba_solver
    from tpu3drecon.solvers.bundle_adjust import BAConfig
    from tpu3drecon.utils.placement import commit

    print("backend:", jax.default_backend(), flush=True)
    problem = commit(expand_onehots(bal_sequential_wtt()))
    jax.device_get(problem.buckets[0].uv[0, 0, 0, 0])

    base = BAConfig(gtol=0.0, ftol=0.0, cg_maxiter=8, cg_rtol=0.0)
    for mi in range(1, 7):
        solver = make_wtt_ba_solver(base._replace(maxiter=mi))
        _, _, st = solver(problem)
        print(
            f"maxiter={mi}: loss {float(st.loss):.4e} "
            f"accepted {int(st.accepted)}/{mi} "
            f"last-iter cg_iters {int(st.cg_iters)} "
            f"lam {float(st.lam):.3e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
