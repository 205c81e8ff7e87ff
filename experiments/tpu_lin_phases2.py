"""Dispatch-clean sub-phase profile of the BAL wtt linearization.

tpu_lin_phases.py timed each phase with ONE call per measurement; the
round-4b overhead fit (experiments/tpu_selection_dot3.py) showed calls
carry ~15-24 ms of tunnel overhead, so those numbers are inflated and
the true linearize is ~43 ms, not 66.6.  This re-profiles with the
corrected harness: every phase prefix runs in a carry-dependent
lax.scan (params perturbed by 1e-30 * prev output sum, so XLA cannot
hoist), at steps 4 and 20, and the per-call overhead is solved out of
the two totals.  Each phase's outputs are reduced with a full sum
(adds one extra read of the outputs, same bias for every phase).

Phases:
  p_cam    table + _cam_planes_w
  p_blk    + _tt_blocks (jc/jp/r planes)
  p_pt     + point-side normals (v6/g_pt/v_inv)
  p_lin    full _linearize (contribs + reductions + cholesky)
  p_cost   _cost alone

Run: cd /root/repo && python experiments/tpu_lin_phases2.py [reps]
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
    from tpu3drecon.problems.wtt import expand_onehots
    from tpu3drecon.solvers import ba_wtt
    from tpu3drecon.solvers.bundle_adjust import BAConfig
    from tpu3drecon.utils.placement import commit

    print("backend:", jax.default_backend(), flush=True)
    problem = commit(expand_onehots(commit(bal_sequential_wtt())))
    config = BAConfig(cg_maxiter=8, cg_rtol=0.0)

    cams = problem.cameras
    pts_list = []
    for bucket, off in zip(problem.buckets, problem.bucket_offsets):
        g, _, tb, pc = bucket.uv.shape
        block = problem.points3d[off : off + g * pc]
        pts_list.append(jnp.moveaxis(block.reshape(g, pc, 3), 2, 0))
    params0 = (cams.rmats, cams.tvecs, cams.fx_fy, cams.dist,
               cams.cx_cy_skew, tuple(pts_list))
    lam = jnp.asarray(1e-3, jnp.float32)

    def tree_sum(x):
        return sum(jnp.sum(leaf.astype(jnp.float32))
                   for leaf in jax.tree_util.tree_leaves(x))

    def table_of(params, prob, dtype):
        rmats, tvecs, fx_fy, dist, ccs, _ = params
        table = ba_wtt._cam_table(rmats, tvecs, fx_fy, ccs, dist)
        return jnp.zeros((prob.c_pad, table.shape[1]), dtype).at[
            : table.shape[0]
        ].set(table)

    def perturb(params, eps):
        rmats, tvecs, fx_fy, dist, ccs, pts = params
        return (rmats, tvecs + eps * 1e-30, fx_fy, dist, ccs, pts)

    def p_cam(params, prob):
        dtype = params[5][0].dtype
        tp = table_of(params, prob, dtype)
        return tuple(ba_wtt._cam_planes_w(tp, b) for b in prob.buckets)

    def p_blk(params, prob):
        dtype = params[5][0].dtype
        tp = table_of(params, prob, dtype)
        inv_w = (1.0 / prob.avg_cam_width).astype(dtype)
        outs = []
        for bucket, pts in zip(prob.buckets, params[5]):
            cp = ba_wtt._cam_planes_w(tp, bucket)
            blocks = jax.vmap(
                lambda c, p, u, m: ba_wtt._tt_blocks(
                    c, p, u, m, inv_w, config),
                in_axes=(0, 1, 0, 0), out_axes=1,
            )(cp, pts, bucket.uv, bucket.mask)
            outs.append((blocks.jc, blocks.jp, blocks.r))
        return tuple(outs)

    def p_pt(params, prob):
        dtype = params[5][0].dtype
        tp = table_of(params, prob, dtype)
        inv_w = (1.0 / prob.avg_cam_width).astype(dtype)
        outs = []
        for bucket, pts in zip(prob.buckets, params[5]):
            cp = ba_wtt._cam_planes_w(tp, bucket)
            blocks = jax.vmap(
                lambda c, p, u, m: ba_wtt._tt_blocks(
                    c, p, u, m, inv_w, config),
                in_axes=(0, 1, 0, 0), out_axes=1,
            )(cp, pts, bucket.uv, bucket.mask)
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
                tuple((bn.jc, bn.jp, bn.v_inv, bn.g_pt)
                      for bn in nb.buckets))

    def p_cost(params, prob):
        return ba_wtt._cost(params, prob, config)

    phases = {
        "p_cam": p_cam, "p_blk": p_blk, "p_pt": p_pt,
        "p_lin": p_lin, "p_cost": p_cost,
    }

    def chain(fn, steps):
        def run(params, prob):
            def step(eps, _):
                out = fn(perturb(params, eps), prob)
                s = tree_sum(out)
                return eps * (1.0 + 1e-30 * s) + 1e-30 * s, s

            _, ss = lax.scan(step, jnp.asarray(0.0, jnp.float32), None,
                             length=steps)
            return ss

        def wrapped(params, prob):
            with jax.default_matmul_precision("highest"):
                return run(params, prob)

        return jax.jit(wrapped)

    fns = {}
    for name, fn in phases.items():
        for steps in (4, 20):
            fns[(name, steps)] = chain(fn, steps)
    for (name, steps), f in fns.items():
        t0 = time.time()
        jax.device_get(f(params0, problem)[0])
        print(f"compile {name}/{steps}: {time.time()-t0:.1f}s", flush=True)

    totals: dict = {}
    for _ in range(reps):
        for key, f in fns.items():
            t0 = time.time()
            jax.device_get(f(params0, problem)[0])
            totals.setdefault(key, []).append(time.time() - t0)
    prev = 0.0
    for name in phases:
        t4 = sorted(totals[(name, 4)])[reps // 2] * 1e3
        t20 = sorted(totals[(name, 20)])[reps // 2] * 1e3
        per = (t20 - t4) / 16.0
        print(f"{name}: {per:.2f} ms/step (delta {per - prev:+.2f}, "
              f"overhead {t4 - 4 * per:.1f})", flush=True)
        if name != "p_cost":
            prev = per


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 6)
