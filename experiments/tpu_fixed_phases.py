"""Decompose the 69 ms post-kernel fixed block per BAL LM iteration.

tpu_kernel_anatomy.py (both index kernels on) fit the solve at
69.2 ms fixed + 4.14 ms/CG-iter.  Known members: fused linearize
18.2 ms, cost ~7, and ~8 ms/iter of tunnel dispatch at 3-iter solves —
leaving ~35 ms unattributed.  Candidates: the rhs (W V^-1 g_pt) and
back-substitution (W^T dc) products still read the 0.98 GB dense
one-hot each, plus their plane materializations; trust-region
bookkeeping; the guarded cholesky.

Method: carry-dependent scans at TWO step counts (4, 16); per-phase
cost = (T16 - T4) / 12 with the per-call dispatch overhead solved out
(CLAUDE.md trap: standalone timings carry ~15-24 ms of tunnel dispatch
each).  The BAL problem and the precomputed linearization ride as jit
ARGUMENTS (closures bake GB arrays into the program -> HTTP 413).

Run: cd /root/repo && python experiments/tpu_fixed_phases.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from tpu3drecon.benchmark.balscale import bal_sequential_wtt
    from tpu3drecon.problems.wtt import expand_onehots
    from tpu3drecon.solvers import ba_wtt
    from tpu3drecon.solvers.bundle_adjust import BAConfig
    from tpu3drecon.utils.placement import commit

    print("backend:", jax.default_backend(), flush=True)
    # --split: the production split_windows packing (round-5 post-split
    # anatomy ask).  Fully-indexed configs never read the dense one-hot,
    # so the split problem stays deferred (no expand pass, no 1 GB HBM).
    split = "--split" in sys.argv
    if split:
        problem = commit(bal_sequential_wtt(split_windows=True))
    else:
        problem = commit(expand_onehots(bal_sequential_wtt()))
    print("split_windows:", split, "buckets:",
          [(b.window, b.uv.shape[0]) for b in problem.buckets], flush=True)
    jax.device_get(problem.buckets[0].uv[0, 0, 0, 0])

    config = BAConfig(
        maxiter=3, gtol=0.0, ftol=0.0, cg_maxiter=8, cg_rtol=0.0,
        precond="schur_jacobi", matvec_kernel="index",
        linearize_kernel="index",
    )
    cams = problem.cameras
    pts_list = []
    for bucket, off in zip(problem.buckets, problem.bucket_offsets):
        g, _, tb, pc = bucket.uv.shape
        block = problem.points3d[off : off + g * pc]
        pts_list.append(jnp.moveaxis(block.reshape(g, pc, 3), 2, 0))
    params0 = (cams.rmats, cams.tvecs, cams.fx_fy, cams.dist,
               cams.cx_cy_skew, tuple(pts_list))
    lam0 = jnp.asarray(1e-3, jnp.float32)

    # Precompute one linearization (its pieces are phase INPUTS).
    @jax.jit
    def lin_once(params, lam, prob):
        with jax.default_matmul_precision("highest"):
            return ba_wtt._linearize(params, lam, prob, config)

    nb0 = lin_once(params0, lam0, problem)
    jax.device_get(nb0.g_cam[0, 0])
    dc0 = jnp.zeros_like(nb0.g_cam) + 1e-4

    def eps_mix(eps, s):
        return eps * (1.0 + 1e-30 * s) + 1e-30 * s

    def lin_phase(eps, params, lam, prob):
        rmats, tvecs, fx_fy, dist, ccs, pts = params
        p = (rmats, tvecs + eps * 1e-30, fx_fy, dist, ccs, pts)
        with jax.default_matmul_precision("highest"):
            nb = ba_wtt._linearize(p, lam, prob, config)
        return jnp.sum(nb.u_chol) + jnp.sum(nb.g_cam) + sum(
            jnp.sum(bn.jc[0, 0, 0, :8]) for bn in nb.buckets
        )

    def cost_phase(eps, params, lam, prob):
        rmats, tvecs, fx_fy, dist, ccs, pts = params
        p = (rmats, tvecs + eps * 1e-30, fx_fy, dist, ccs, pts)
        with jax.default_matmul_precision("highest"):
            return ba_wtt._cost(p, prob, config)

    # rhs/backsub ride the SAME index-kernel paths the production solver
    # uses whenever matvec_kernel is set (_ba_solve_wtt_core.w_times /
    # wt_times): the dense-one-hot XLA helpers don't exist on deferred
    # (wcam-only) packings at all, and the anatomy should decompose the
    # program that actually ships.
    from tpu3drecon.ops.pallas.wtt_matvec import (
        wtt_w_rows_idx,
        wtt_wt_planes_idx,
    )

    def _w_times_idx(bn, vw, bucket, prob):
        np_cam = bn.jc.shape[0] // 2
        _, _, tb, pc = bucket.uv.shape
        rows = wtt_w_rows_idx(
            vw, bucket.wcam, bn.jc, bn.jp, np_cam, tb, pc,
            int(bucket.window), terms=3, interpret=False,
        )
        return ba_wtt._scatter_rows(
            jnp.transpose(rows, (0, 2, 1)), ba_wtt._window_idx(bucket),
            prob.c_pad,
        )

    def _wt_times_idx(bn, dc, bucket):
        np_cam = bn.jc.shape[0] // 2
        _, _, tb, pc = bucket.uv.shape
        xw_t = jnp.transpose(
            ba_wtt._window_rows(dc, ba_wtt._window_idx(bucket)), (0, 2, 1)
        )
        return wtt_wt_planes_idx(
            xw_t, bucket.wcam, bn.jc, bn.jp, np_cam, tb, pc,
            int(bucket.window), terms=3, interpret=False,
        )

    def rhs_phase(eps, nb, prob):
        b = jnp.zeros_like(nb.g_cam)
        for bn, bucket in zip(nb.buckets, prob.buckets):
            vw = ba_wtt._sym3_matvec_g(
                bn.v_inv, (bn.g_pt + eps * 1e-30)
            )
            b = b + _w_times_idx(bn, vw, bucket, prob)
        return jnp.sum(b - nb.g_cam)

    def backsub_phase(eps, nb, dc, prob):
        out = jnp.zeros(())
        dcp = dc + eps * 1e-30
        pred_pt = jnp.zeros(())
        for bn, bucket in zip(nb.buckets, prob.buckets):
            wtx = _wt_times_idx(bn, dcp, bucket)
            dp = ba_wtt._sym3_matvec_g(bn.v_inv, -bn.g_pt - wtx)
            pred_pt = pred_pt + 0.5 * (
                jnp.sum(dp * (bn.damp_pt * dp)) - jnp.sum(dp * bn.g_pt)
            )
            out = out + jnp.sum(dp[:, :, :8])
        return out + pred_pt

    def retract_phase(eps, params, dc, prob):
        rmats, tvecs, fx_fy, dist, ccs, pts = params
        dcp = dc[: rmats.shape[0]] + eps * 1e-30
        from tpu3drecon.ops.jacobians import apply_se3_retraction

        with jax.default_matmul_precision("highest"):
            new_r, new_t, new_f = apply_se3_retraction(
                rmats, tvecs, fx_fy, dcp[:, :8]
            )
        new_pts = tuple(p + 1e-30 * eps for p in pts)
        return (jnp.sum(new_r) + jnp.sum(new_t) + jnp.sum(new_f)
                + sum(jnp.sum(p[0, 0, :8]) for p in new_pts))

    def pcg8_phase(eps, nb, prob):
        b = nb.g_cam + eps * 1e-30
        dc, _ = ba_wtt._pcg(
            nb, b, prob, 8, 0.0, use_kernel="index", interpret=False
        )
        return jnp.sum(dc)

    def body_phase(eps, params, lam, prob):
        # One full LM iteration's work (propose + apply + cost), python-
        # assembled exactly as _ba_solve_wtt_core.body does minus the
        # while_loop/TRState bookkeeping.
        rmats, tvecs, fx_fy, dist, ccs, pts = params
        p = (rmats, tvecs + eps * 1e-30, fx_fy, dist, ccs, pts)
        with jax.default_matmul_precision("highest"):
            nb = ba_wtt._linearize(p, lam, prob, config)
            if nb.b_cam is not None:  # fused rhs columns (production)
                b = nb.b_cam - nb.g_cam
            else:
                b = jnp.zeros_like(nb.g_cam)
                for bn, bucket in zip(nb.buckets, prob.buckets):
                    vw = ba_wtt._sym3_matvec_g(bn.v_inv, bn.g_pt)
                    b = b + _w_times_idx(bn, vw, bucket, prob)
                b = b - nb.g_cam
            dc, _ = ba_wtt._pcg(
                nb, b, prob, 8, 0.0, use_kernel="index", interpret=False
            )
            dps = []
            for bn, bucket in zip(nb.buckets, prob.buckets):
                wtx = _wt_times_idx(bn, dc, bucket)
                dps.append(ba_wtt._sym3_matvec_g(bn.v_inv, -bn.g_pt - wtx))
            from tpu3drecon.ops.jacobians import apply_se3_retraction

            new_r, new_t, new_f = apply_se3_retraction(
                rmats, tvecs, fx_fy, dc[: rmats.shape[0], :8]
            )
            new_pts = tuple(
                pt + dp for pt, dp in zip(pts, dps)
            )
            cand = (new_r, new_t, new_f, dist, ccs, new_pts)
            return ba_wtt._cost(cand, prob, config)

    def make_scan(phase, steps, *args):
        def run(eps0, *a):
            def step(eps, _):
                s = phase(eps, *a)
                return eps_mix(eps, s), s

            _, ss = lax.scan(step, eps0, None, length=steps)
            return ss

        return jax.jit(run), (jnp.asarray(0.0, jnp.float32),) + args

    phases = {
        "lin": (lin_phase, (params0, lam0, problem)),
        "cost": (cost_phase, (params0, lam0, problem)),
        "rhs": (rhs_phase, (nb0, problem)),
        "backsub": (backsub_phase, (nb0, dc0, problem)),
        "retract": (retract_phase, (params0, dc0, problem)),
        "pcg8": (pcg8_phase, (nb0, problem)),
        "body": (body_phase, (params0, lam0, problem)),
    }
    fns = {}
    for name, (phase, args) in phases.items():
        for steps in (4, 16):
            fns[(name, steps)] = make_scan(phase, steps, *args)
    for (name, steps), (fn, args) in fns.items():
        t0 = time.time()
        jax.device_get(fn(*args)[0])
        print(f"compile {name}/{steps}: {time.time()-t0:.1f}s", flush=True)
    totals = {}
    for _ in range(7):
        for key, (fn, args) in fns.items():
            t0 = time.time()
            jax.device_get(fn(*args)[0])
            totals.setdefault(key, []).append(time.time() - t0)
    print("\nper-phase (dispatch solved out):", flush=True)
    total = 0.0
    for name in phases:
        t4 = sorted(totals[(name, 4)])[3]
        t16 = sorted(totals[(name, 16)])[3]
        ms = (t16 - t4) / 12.0 * 1e3
        total += ms
        print(f"  {name:8s}: {ms:6.2f} ms", flush=True)
    print(f"  sum      : {total:6.2f} ms (+ ~4.1 ms x cg8 = "
          f"{total + 8 * 4.14:.1f} vs 102 ms/LM-iter measured)", flush=True)


if __name__ == "__main__":
    main()
