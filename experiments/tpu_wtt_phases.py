"""Phase decomposition of one BAL-scale wtt LM iteration on the TPU.

The cg ladder (experiments/tpu_wtt_anatomy.py) put the FIXED per-iteration
cost at ~81 ms against a ~17 ms HBM floor (5-6x), while extra CG matvecs
run at ~7.5 ms vs a 3.75 ms floor (2x) — so the linearization/rhs/backsub/
cost block, not the matvec, is where the non-roofline milliseconds live.
This times the phases individually (each jitted standalone, best of many
reps; the ~3-9 ms tunnel dispatch overhead per call is small at this
scale and affects every phase equally):

  lin      _linearize at fixed (params, lam)  [jc/jp/v_inv returned as real
           outputs so XLA must materialize them, as the solve does]
  cost     _cost at fixed params
  prop1    full propose with cg_maxiter=1 (lin + rhs + 1 matvec + backsub)

Derived: rhs+backsub+precond ~ prop1 - lin - 1 matvec; trust-region
bookkeeping + apply_step ~ (cg=1 iteration time) - prop1 - cost.

Run: cd /root/repo && python experiments/tpu_wtt_phases.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(reps: int = 20) -> None:
    import jax
    import jax.numpy as jnp

    from tpu3drecon.benchmark.balscale import bal_sequential_wtt
    from tpu3drecon.problems.wtt import expand_onehots
    from tpu3drecon.solvers import ba_wtt
    from tpu3drecon.solvers.bundle_adjust import BAConfig
    from tpu3drecon.utils.placement import commit

    print("backend:", jax.default_backend(), flush=True)
    problem = commit(expand_onehots(bal_sequential_wtt()))
    jax.device_get(problem.buckets[0].uv[0, 0, 0, 0])

    config = BAConfig(maxiter=3, gtol=0.0, ftol=0.0, cg_maxiter=1, cg_rtol=0.0)
    cams = problem.cameras
    pts_list = []
    for bucket, off in zip(problem.buckets, problem.bucket_offsets):
        g, _, tb, pc = bucket.uv.shape
        block = problem.points3d[off : off + g * pc]
        pts_list.append(jnp.moveaxis(block.reshape(g, pc, 3), 2, 0))
    params0 = (
        cams.rmats, cams.tvecs, cams.fx_fy, cams.dist, cams.cx_cy_skew,
        tuple(pts_list),
    )
    lam0 = jnp.asarray(1e-3, jnp.float32)

    def lin_fn(params, lam, prob):
        with jax.default_matmul_precision("highest"):
            nb = ba_wtt._linearize(params, lam, prob, config)
        # Real outputs: force materialization of everything the CG loop
        # and back-substitution consume from the linearization.
        return (
            nb.u_chol, nb.g_cam,
            tuple((bn.jc, bn.jp, bn.v_inv, bn.g_pt) for bn in nb.buckets),
        )

    def cost_fn(params, prob):
        with jax.default_matmul_precision("highest"):
            return ba_wtt._cost(params, prob, config)

    def prop1_fn(params, lam, prob):
        with jax.default_matmul_precision("highest"):
            nb = ba_wtt._linearize(params, lam, prob, config)
            b = jnp.zeros_like(nb.g_cam)
            for bn, bucket in zip(nb.buckets, prob.buckets):
                vw = ba_wtt._sym3_matvec_g(bn.v_inv, bn.g_pt)
                b = b + ba_wtt._w_times_bucket_w(bn, vw, bucket, prob.c_pad)
            b = b - nb.g_cam
            dc, _ = ba_wtt._pcg(nb, b, prob, 1, 0.0)
            dps = []
            for bn, bucket in zip(nb.buckets, prob.buckets):
                wtx = ba_wtt._wt_times_bucket_w(bn, dc, bucket)
                dps.append(ba_wtt._sym3_matvec_g(bn.v_inv, -bn.g_pt - wtx))
        return dc, tuple(dps)

    # The problem is a jit ARGUMENT (not a closure): closed-over device
    # arrays are baked into the uploaded program and the remote compile
    # server rejects the GB-scale body with HTTP 413.
    phases = {
        "lin": (jax.jit(lin_fn), (params0, lam0, problem)),
        "cost": (jax.jit(cost_fn), (params0, problem)),
        "prop1": (jax.jit(prop1_fn), (params0, lam0, problem)),
    }

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        jax.device_get(leaf.ravel()[0])

    results = {}
    for name, (fn, args) in phases.items():
        t0 = time.time()
        sync(fn(*args))
        print(f"{name}: compile+first {time.time()-t0:.1f}s", flush=True)
    for _ in range(reps):
        for name, (fn, args) in phases.items():
            t0 = time.time()
            sync(fn(*args))
            results.setdefault(name, []).append(time.time() - t0)
    for name, ts in results.items():
        ts = sorted(ts)
        print(f"{name}: best {ts[0]*1e3:.1f} ms median {ts[len(ts)//2]*1e3:.1f} ms",
              flush=True)

    lin = min(results["lin"]); prop1 = min(results["prop1"])
    cost = min(results["cost"])
    print(f"\nderived: rhs+1matvec+backsub = prop1 - lin = {(prop1-lin)*1e3:.1f} ms",
          flush=True)
    print(f"lin + prop-extras + cost = {(prop1+cost)*1e3:.1f} ms "
          f"(vs 88.6 ms cg=1 iteration from the anatomy ladder)", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
