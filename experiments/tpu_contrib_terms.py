"""Contribution-kernel dot strategy A/B: split-3 vs HIGHEST (terms=0).

tpu_lin_phases3.py put the contribution kernel at 10.05 ms of the
13.95 ms kernel linearize.  The split chain costs 2 VPU ops per plane
per term on a ~99-plane operand (vs 9 planes in the matvec, where the
split wins); HIGHEST pays 6 MXU passes on the one-hot side but zero
split work.  Both are exact.  Measures the standalone contribution
kernel at BAL scale via 4/20-step scans (overhead solved out).

Run: cd /root/repo && python experiments/tpu_contrib_terms.py
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
    from tpu3drecon.ops.pallas.wtt_linearize import wtt_contrib_rows_idx
    from tpu3drecon.solvers import ba_wtt
    from tpu3drecon.solvers.bundle_adjust import BAConfig
    from tpu3drecon.utils.placement import commit

    print("backend:", jax.default_backend(), flush=True)
    problem = commit(bal_sequential_wtt())
    config = BAConfig(matvec_kernel="index", linearize_kernel="index")

    cams = problem.cameras
    pts_list = []
    for bucket, off in zip(problem.buckets, problem.bucket_offsets):
        g, _, tb, pc = bucket.uv.shape
        block = problem.points3d[off : off + g * pc]
        pts_list.append(jnp.moveaxis(block.reshape(g, pc, 3), 2, 0))
    params0 = (cams.rmats, cams.tvecs, cams.fx_fy, cams.dist,
               cams.cx_cy_skew, tuple(pts_list))
    lam = jnp.asarray(1e-3, jnp.float32)

    @jax.jit
    def lin_once(params, prob):
        with jax.default_matmul_precision("highest"):
            return ba_wtt._linearize(params, lam, prob, config)

    nb0 = lin_once(params0, problem)
    jax.device_get(nb0.g_cam[0, 0])
    # Dominant bucket (most slots) — bucket 0 can be tiny.
    bi = max(range(len(problem.buckets)),
             key=lambda i: problem.buckets[i].mask.size)
    bucket = problem.buckets[bi]
    bn = nb0.buckets[bi]
    print("bucket", bi, "uv", tuple(bucket.uv.shape), flush=True)
    g, _, tb, pc = bucket.uv.shape
    np_cam = bn.jc.shape[0] // 2
    r = jnp.zeros((2, g, tb, pc), bn.jc.dtype) + 0.1

    def contrib_phase(terms):
        def run(eps0, jc, jp, rr, vinv, wcam, steps):
            def step(eps, _):
                rows = wtt_contrib_rows_idx(
                    wcam, jc + eps * 1e-30, jp, rr, vinv, np_cam, tb, pc,
                    int(bucket.window), True, False, terms=terms,
                    interpret=False,
                )
                s = jnp.sum(rows)
                return eps * (1.0 + 1e-30 * s) + 1e-30 * s, s

            _, ss = lax.scan(step, eps0, None, length=steps)
            return ss

        return run

    fns = {}
    for terms in (3, 2, 0):
        for steps in (4, 20):
            fns[(terms, steps)] = jax.jit(
                contrib_phase(terms), static_argnames=("steps",)
            )
    args = (jnp.asarray(0.0, jnp.float32), bn.jc, bn.jp, r, bn.v_inv,
            bucket.wcam)
    outs = {}
    for (terms, steps), f in fns.items():
        t0 = time.time()
        out = f(*args, steps=steps)
        jax.device_get(out[0])
        outs[(terms, steps)] = out
        print(f"compile terms={terms}/{steps}: {time.time()-t0:.1f}s",
              flush=True)
    # Exactness check: terms=0 (HIGHEST) vs terms=3 (split) per-scan sums.
    d30 = abs(float(jax.device_get(outs[(3, 4)][0]))
              - float(jax.device_get(outs[(0, 4)][0])))
    rel = d30 / max(1e-30, abs(float(jax.device_get(outs[(0, 4)][0]))))
    print(f"split3 vs HIGHEST rel diff: {rel:.2e}", flush=True)
    totals = {}
    for _ in range(6):
        for key, f in fns.items():
            t0 = time.time()
            jax.device_get(f(*args, steps=key[1])[0])
            totals.setdefault(key, []).append(time.time() - t0)
    for terms in (3, 2, 0):
        t4 = sorted(totals[(terms, 4)])[3]
        t20 = sorted(totals[(terms, 20)])[3]
        print(f"terms={terms}: {(t20 - t4) / 16.0 * 1e3:6.2f} ms/call",
              flush=True)


if __name__ == "__main__":
    main()
