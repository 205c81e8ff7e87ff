"""Sub-phase profile of the BAL-scale wtt linearization on the TPU.

The phase decomposition (experiments/tpu_wtt_phases.py) measured
_linearize at 66.6 ms against a ~13.5 ms HBM floor — the biggest
single-chip gap left.  This times cumulative prefixes of the
linearization pipeline (each a standalone jit with the problem as an
argument; successive differences attribute the milliseconds):

  s1  cam planes       _cam_planes_w (one-hot expansion of the cam table)
  s2  + residual/jacobian planes (_tt_blocks vmapped over chunks)
  s3  + point-side normals (v6 / g_pt / v_inv / damp)
  s4  full _linearize (adds the chunked contribution planes + window
      scatter + cholesky)

Run: cd /root/repo && python experiments/tpu_lin_phases.py [reps]
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
    from tpu3drecon.solvers.bundle_adjust import BAConfig, n_cam_params
    from tpu3drecon.utils.placement import commit

    print("backend:", jax.default_backend(), flush=True)
    problem = commit(expand_onehots(bal_sequential_wtt()))
    jax.device_get(problem.buckets[0].uv[0, 0, 0, 0])

    config = BAConfig(maxiter=3, gtol=0.0, ftol=0.0, cg_maxiter=8, cg_rtol=0.0)
    np_cam = n_cam_params(config)
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

    def table_of(params, prob):
        rmats, tvecs, fx_fy, dist, ccs, _ = params
        table = ba_wtt._cam_table(rmats, tvecs, fx_fy, ccs, dist)
        return jnp.zeros((prob.c_pad, table.shape[1]), table.dtype).at[
            : table.shape[0]
        ].set(table)

    def s1_fn(params, prob):
        with jax.default_matmul_precision("highest"):
            tp = table_of(params, prob)
            return tuple(
                ba_wtt._cam_planes_w(tp, b) for b in prob.buckets
            )

    def s2_fn(params, prob):
        with jax.default_matmul_precision("highest"):
            tp = table_of(params, prob)
            inv_w = (1.0 / prob.avg_cam_width).astype(tp.dtype)
            outs = []
            for bucket, pts in zip(prob.buckets, params[5]):
                cp = ba_wtt._cam_planes_w(tp, bucket)
                blocks = jax.vmap(
                    lambda c, p, u, m: ba_wtt._tt_blocks(
                        c, p, u, m, inv_w, config
                    ),
                    in_axes=(0, 1, 0, 0),
                    out_axes=1,
                )(cp, pts, bucket.uv, bucket.mask)
                outs.append((blocks.jc, blocks.jp, blocks.r))
            return tuple(outs)

    def s3_fn(params, lam, prob):
        with jax.default_matmul_precision("highest"):
            tp = table_of(params, prob)
            inv_w = (1.0 / prob.avg_cam_width).astype(tp.dtype)
            outs = []
            for bucket, pts in zip(prob.buckets, params[5]):
                cp = ba_wtt._cam_planes_w(tp, bucket)
                blocks = jax.vmap(
                    lambda c, p, u, m: ba_wtt._tt_blocks(
                        c, p, u, m, inv_w, config
                    ),
                    in_axes=(0, 1, 0, 0),
                    out_axes=1,
                )(cp, pts, bucket.uv, bucket.mask)
                jc, jp, r = blocks.jc, blocks.jp, blocks.r
                v6 = jnp.stack(
                    [
                        jnp.sum(jp[i] * jp[j] + jp[3 + i] * jp[3 + j], axis=1)
                        for (i, j) in [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
                    ]
                )
                g_pt = jnp.stack(
                    [
                        jnp.sum(jp[i] * r[0] + jp[3 + i] * r[1], axis=1)
                        for i in range(3)
                    ]
                )
                dv = jnp.clip(v6[jnp.asarray([0, 3, 5])], 1e-8, None)
                v6_d = v6.at[jnp.asarray([0, 3, 5])].add(lam * dv)
                v_inv = ba_wtt._sym3_inv_planes(v6_d)
                outs.append((jc, jp, r, v_inv, g_pt))
            return tuple(outs)

    def s4_fn(params, lam, prob):
        with jax.default_matmul_precision("highest"):
            nb = ba_wtt._linearize(params, lam, prob, config)
        return (
            nb.u_chol, nb.g_cam,
            tuple((bn.jc, bn.jp, bn.v_inv, bn.g_pt) for bn in nb.buckets),
        )

    phases = {
        "s1_cam_planes": (jax.jit(s1_fn), (params0, problem)),
        "s2_+blocks": (jax.jit(s2_fn), (params0, problem)),
        "s3_+point_normals": (jax.jit(s3_fn), (params0, lam0, problem)),
        "s4_full_linearize": (jax.jit(s4_fn), (params0, lam0, problem)),
    }

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        jax.device_get(leaf.ravel()[0])

    for name, (fn, args) in phases.items():
        t0 = time.time()
        sync(fn(*args))
        print(f"{name}: compile+first {time.time()-t0:.1f}s", flush=True)

    results = {}
    for _ in range(reps):
        for name, (fn, args) in phases.items():
            t0 = time.time()
            sync(fn(*args))
            results.setdefault(name, []).append(time.time() - t0)
    prev = 0.0
    for name in phases:
        ts = sorted(results[name])
        best = ts[0] * 1e3
        print(f"{name}: best {best:.1f} ms median {ts[len(ts)//2]*1e3:.1f} ms "
              f"(delta {best - prev:+.1f} ms)", flush=True)
        prev = best


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
