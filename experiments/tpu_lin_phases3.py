"""Sub-phase profile of the KERNEL-mode BAL wtt linearization.

tpu_fixed_phases.py puts the fused linearize at 18.3 ms — now the
largest fixed phase.  This splits it with the same dispatch-clean
harness as tpu_lin_phases2.py (carry-dependent scans at 4/20 steps,
overhead solved out), with the index kernels on:

  p_cam    table + index cam-plane kernel
  p_blk    + _tt_blocks (jc/jp/r planes)
  p_pt     + point-side normals (v6/g_pt/v_inv)
  p_lin    full kernel _linearize (contribution kernel + cholesky)

Deltas: blocks = p_blk - p_cam; point side = p_pt - p_blk;
contribution kernel + chol = p_lin - p_pt.

Run: cd /root/repo && python experiments/tpu_lin_phases3.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(reps: int = 6) -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from tpu3drecon.benchmark.balscale import bal_sequential_wtt
    from tpu3drecon.ops.pallas.wtt_linearize import wtt_cam_planes_idx
    from tpu3drecon.solvers import ba_wtt
    from tpu3drecon.solvers.bundle_adjust import BAConfig
    from tpu3drecon.utils.placement import commit

    print("backend:", jax.default_backend(), flush=True)
    problem = commit(bal_sequential_wtt())
    config = BAConfig(
        cg_maxiter=8, cg_rtol=0.0, matvec_kernel="index",
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
    lam = jnp.asarray(1e-3, jnp.float32)

    def table_of(params, prob, dtype):
        rmats, tvecs, fx_fy, dist, ccs, _ = params
        table = ba_wtt._cam_table(rmats, tvecs, fx_fy, ccs, dist)
        return jnp.zeros((prob.c_pad, table.shape[1]), dtype).at[
            : table.shape[0]
        ].set(table)

    def cam_planes(tp, bucket):
        _, _, tb, pc = bucket.uv.shape
        tw = ba_wtt._window_rows(tp, ba_wtt._window_idx(bucket))
        return wtt_cam_planes_idx(
            bucket.wcam, tw, tb, pc, int(bucket.window), terms=3,
            interpret=jax.default_backend() != "tpu",
        )

    def p_cam(params, prob):
        dtype = params[5][0].dtype
        tp = table_of(params, prob, dtype)
        return tuple(cam_planes(tp, b) for b in prob.buckets)

    def blocks_of(tp, bucket, pts, prob, dtype):
        inv_w = (1.0 / prob.avg_cam_width).astype(dtype)
        cp = cam_planes(tp, bucket)
        return jax.vmap(
            lambda c, p, u, m: ba_wtt._tt_blocks(c, p, u, m, inv_w, config),
            in_axes=(0, 1, 0, 0), out_axes=1,
        )(cp, pts, bucket.uv, bucket.mask)

    def p_blk(params, prob):
        dtype = params[5][0].dtype
        tp = table_of(params, prob, dtype)
        return tuple(
            (b.jc, b.jp, b.r)
            for b in (blocks_of(tp, bucket, pts, prob, dtype)
                      for bucket, pts in zip(prob.buckets, params[5]))
        )

    def p_pt(params, prob):
        dtype = params[5][0].dtype
        tp = table_of(params, prob, dtype)
        outs = []
        for bucket, pts in zip(prob.buckets, params[5]):
            blocks = blocks_of(tp, bucket, pts, prob, dtype)
            jc, jp, r = blocks.jc, blocks.jp, blocks.r
            v6 = jnp.stack([
                jnp.sum(jp[i] * jp[j] + jp[3 + i] * jp[3 + j], axis=1)
                for (i, j) in [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2),
                               (2, 2)]
            ])
            g_pt = jnp.stack([
                jnp.sum(jp[i] * r[0] + jp[3 + i] * r[1], axis=1)
                for i in range(3)
            ])
            dv = jnp.clip(v6[jnp.asarray([0, 3, 5])], 1e-8, None)
            v6_d = v6.at[jnp.asarray([0, 3, 5])].add(lam * dv)
            v_inv = ba_wtt._sym3_inv_planes(v6_d)
            outs.append((jc, jp, r, v_inv, g_pt))
        return tuple(outs)

    def p_lin(params, prob):
        nb = ba_wtt._linearize(params, lam, prob, config)
        return (nb.u_chol, nb.g_cam,
                tuple((bn.jc[0, 0, 0, :8],) for bn in nb.buckets))

    def perturb(params, eps):
        rmats, tvecs, fx_fy, dist, ccs, pts = params
        return (rmats, tvecs + eps * 1e-30, fx_fy, dist, ccs, pts)

    def make_scan(phase, steps):
        def run(params, prob):
            def step(eps, _):
                out = phase(perturb(params, eps), prob)
                # FULL sums (never slice-reduce: XLA pushes slices through
                # dots and skips the work — CLAUDE.md trap).  The extra
                # read of the outputs biases every phase equally.
                s = sum(
                    jnp.sum(leaf.astype(jnp.float32))
                    for leaf in jax.tree_util.tree_leaves(out)
                )
                return eps * (1.0 + 1e-30 * s) + 1e-30 * s, s

            _, ss = lax.scan(step, jnp.asarray(0.0, jnp.float32), None,
                             length=steps)
            return ss

        return jax.jit(run)

    phases = ("p_cam", "p_blk", "p_pt", "p_lin")
    fns = {}
    for name in phases:
        for steps in (4, 20):
            fns[(name, steps)] = make_scan(
                {"p_cam": p_cam, "p_blk": p_blk, "p_pt": p_pt,
                 "p_lin": p_lin}[name], steps)
    with jax.default_matmul_precision("highest"):
        for (name, steps), f in fns.items():
            t0 = time.time()
            jax.device_get(f(params0, problem)[0])
            print(f"compile {name}/{steps}: {time.time()-t0:.1f}s",
                  flush=True)
        totals = {}
        for _ in range(reps):
            for key, f in fns.items():
                t0 = time.time()
                jax.device_get(f(params0, problem)[0])
                totals.setdefault(key, []).append(time.time() - t0)
    res = {}
    for name in phases:
        t4 = sorted(totals[(name, 4)])[len(totals[(name, 4)]) // 2]
        t20 = sorted(totals[(name, 20)])[len(totals[(name, 20)]) // 2]
        res[name] = (t20 - t4) / 16.0 * 1e3
        print(f"{name}: {res[name]:6.2f} ms", flush=True)
    print(f"\nblocks  = {res['p_blk'] - res['p_cam']:6.2f} ms", flush=True)
    print(f"pt side = {res['p_pt'] - res['p_blk']:6.2f} ms", flush=True)
    print(f"contrib+chol = {res['p_lin'] - res['p_pt']:6.2f} ms", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 6)
