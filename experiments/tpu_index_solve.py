"""Full BAL wtt solve A/B: XLA matvec vs index-kernel matvec modes.

The kernel-level ladder (experiments/tpu_index_matvec3.py) measured the
coupling product at 7.57 (XLA) / 3.93 ("index", f32-faithful) / 1.68
("index1", bf16) ms per matvec.  This runs the WHOLE solve —
linearize + 8-CG + cost + trust region — interleaved in one process at
BAL scale (1712 cams / 953k pts / 3.8M obs) for matvec_kernel in
{False, "index", "index1"}, and checks the loss trajectories: "index"
must match XLA to f32 accumulation noise; "index1" must still descend.

Run: cd /root/repo && python experiments/tpu_index_solve.py [lm_iters]
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def main(lm_iters: int = 3):
    import jax

    from tpu3drecon.benchmark.balscale import bal_sequential_wtt
    from tpu3drecon.problems.wtt import expand_onehots
    from tpu3drecon.solvers.ba_wtt import make_wtt_ba_solver
    from tpu3drecon.solvers.bundle_adjust import BAConfig
    from tpu3drecon.utils.placement import commit

    base = BAConfig(
        maxiter=lm_iters, gtol=0.0, ftol=0.0, cg_maxiter=8, cg_rtol=0.0,
        precond="schur_jacobi",
    )
    print("backend:", jax.default_backend(), flush=True)
    problem = expand_onehots(commit(bal_sequential_wtt()))

    results = {}
    solvers = {}
    for mode in (False, "index", "index1"):
        solvers[mode] = make_wtt_ba_solver(base._replace(matvec_kernel=mode))
    for mode, solver in solvers.items():
        t0 = time.time()
        cams, pts, state = solver(problem)
        jax.block_until_ready(pts)
        loss = float(jax.device_get(state.loss))
        print(f"[{mode}] compile+first {time.time()-t0:.1f}s "
              f"loss {loss:.6e}", flush=True)

    for rep in range(3):
        for mode, solver in solvers.items():
            t0 = time.time()
            cams, pts, state = solver(problem)
            jax.block_until_ready(pts)
            loss = float(jax.device_get(state.loss))
            acc = int(jax.device_get(state.accepted))
            results.setdefault(mode, []).append(
                (time.time() - t0, loss, acc))

    for mode, rows in results.items():
        times = sorted(t for t, _, _ in rows)
        _, loss, acc = rows[-1]
        print(f"RESULT {mode}: {times[1]/lm_iters:.4f} s/LM-iter "
              f"(times {[f'{t:.3f}' for t, _, _ in rows]}), "
              f"loss {loss:.6e}, accepted {acc}/{lm_iters}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
