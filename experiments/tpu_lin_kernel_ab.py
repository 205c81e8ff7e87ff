"""A/B: fused Pallas contribution kernel vs batched-XLA linearize (BAL).

experiments/tpu_lin_phases2.py attributed 33.2 of the 41.5 ms BAL-scale
linearize to the contribution block (plane transients ~8-9 GB).  The
index contribution kernel (ops/pallas/wtt_linearize.py) computes the
planes in VMEM and reduces through rebuilt one-hots with exact split
dots.  Measures (two-step-count scans, overhead solved out):

  lin_xla / lin_idx      _linearize alone
  solve ladder           whole solve s/LM-iter for
                         (matvec, linearize) in {(index, off),
                         (index, index), (index1, index)}

Run: cd /root/repo && python experiments/tpu_lin_kernel_ab.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from tpu3drecon.benchmark.balscale import bal_sequential_wtt
    from tpu3drecon.problems.wtt import expand_onehots
    from tpu3drecon.solvers import ba_wtt
    from tpu3drecon.solvers.ba_wtt import make_wtt_ba_solver
    from tpu3drecon.solvers.bundle_adjust import BAConfig
    from tpu3drecon.utils.placement import commit

    print("backend:", jax.default_backend(), flush=True)
    problem = expand_onehots(commit(bal_sequential_wtt()))
    base = BAConfig(
        maxiter=3, gtol=0.0, ftol=0.0, cg_maxiter=8, cg_rtol=0.0,
        precond="schur_jacobi",
    )

    cams = problem.cameras
    pts_list = []
    for bucket, off in zip(problem.buckets, problem.bucket_offsets):
        g, _, tb, pc = bucket.uv.shape
        block = problem.points3d[off : off + g * pc]
        pts_list.append(jnp.moveaxis(block.reshape(g, pc, 3), 2, 0))
    params0 = (cams.rmats, cams.tvecs, cams.fx_fy, cams.dist,
               cams.cx_cy_skew, tuple(pts_list))

    # --- linearize alone, overhead-clean ------------------------------
    def lin_chain(config, steps):
        def run(params, prob):
            def step(eps, _):
                rmats, tvecs, fx_fy, dist, ccs, pts = params
                p = (rmats, tvecs + eps * 1e-30, fx_fy, dist, ccs, pts)
                with jax.default_matmul_precision("highest"):
                    nb = ba_wtt._linearize(
                        p, jnp.asarray(1e-3, jnp.float32), prob, config)
                s = jnp.sum(nb.u_chol) + jnp.sum(nb.g_cam) + sum(
                    jnp.sum(bn.jc[0, 0, 0, :8]) for bn in nb.buckets
                )
                return eps * (1.0 + 1e-30 * s) + 1e-30 * s, s

            _, ss = lax.scan(step, jnp.asarray(0.0, jnp.float32), None,
                             length=steps)
            return ss

        return jax.jit(run)

    fns = {}
    for tag, cfg in (("lin_xla", base),
                     ("lin_idx", base._replace(linearize_kernel="index"))):
        for steps in (4, 20):
            fns[(tag, steps)] = lin_chain(cfg, steps)
    for (tag, steps), f in fns.items():
        t0 = time.time()
        jax.device_get(f(params0, problem)[0])
        print(f"compile {tag}/{steps}: {time.time()-t0:.1f}s", flush=True)
    totals = {}
    for _ in range(6):
        for key, f in fns.items():
            t0 = time.time()
            jax.device_get(f(params0, problem)[0])
            totals.setdefault(key, []).append(time.time() - t0)
    for tag in ("lin_xla", "lin_idx"):
        t4 = sorted(totals[(tag, 4)])[3] * 1e3
        t20 = sorted(totals[(tag, 20)])[3] * 1e3
        print(f"{tag}: {(t20 - t4) / 16.0:.2f} ms/linearize", flush=True)

    # --- whole-solve ladder -------------------------------------------
    ladder = [
        ("mv=index lin=off", base._replace(matvec_kernel="index")),
        ("mv=index lin=index", base._replace(
            matvec_kernel="index", linearize_kernel="index")),
        ("mv=index1 lin=index", base._replace(
            matvec_kernel="index1", linearize_kernel="index")),
    ]
    solvers = [(tag, make_wtt_ba_solver(cfg)) for tag, cfg in ladder]
    for tag, solver in solvers:
        t0 = time.time()
        cams_o, pts_o, state = solver(problem)
        jax.block_until_ready(pts_o)
        print(f"[{tag}] compile+first {time.time()-t0:.1f}s loss "
              f"{float(jax.device_get(state.loss)):.4e}", flush=True)
    for tag, solver in solvers:
        times = []
        for _ in range(3):
            t0 = time.time()
            cams_o, pts_o, state = solver(problem)
            jax.block_until_ready(pts_o)
            float(jax.device_get(state.loss))
            times.append(time.time() - t0)
        print(f"RESULT {tag}: {sorted(times)[1]/3:.4f} s/LM-iter "
              f"loss {float(jax.device_get(state.loss)):.4e} accepted "
              f"{int(jax.device_get(state.accepted))}/3", flush=True)


if __name__ == "__main__":
    main()
