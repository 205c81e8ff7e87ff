"""Index-encoded fused PCG matvec vs one-hot streams (BAL scale).

tpu_selection_dot3.py recalibration: the one-hot einsums run AT the
~630 GB/s stream roofline, so the only lever left is byte elimination.
Per CG iteration the XLA matvec streams the 0.98 GB int8 one-hot twice
plus jc/jp twice (~4.7 GB); the round-3 fused kernel halved that but
still streamed the dense one-hot (and lost 25% to scheduling).  The new
``wtt_coupling_rows_idx`` kernel carries ``WTTBucket.wcam`` — 2-4 bytes
per SLOT instead of ``window`` bytes — and rebuilds one-hot tiles in
VMEM by iota-compare, cutting the per-matvec stream to jc/jp + 15 MB.

Measures (carry-dependent matvec chains, steps 4 and 20; the per-call
tunnel overhead O is solved out of the two totals):

  xla      _schur_matvec use_kernel=False  (production path)
  fused    round-3 dense-one-hot kernel    (use_kernel=True path)
  index    wtt_coupling_rows_idx

plus numeric max-rel-diff of each vs the XLA path on the same operands.

Run: cd /root/repo && python experiments/tpu_index_matvec.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from tpu3drecon.benchmark.balscale import bal_sequential_wtt
    from tpu3drecon.ops.pallas.wtt_matvec import (
        wtt_coupling_rows_fused,
        wtt_coupling_rows_idx,
    )
    from tpu3drecon.problems.wtt import expand_onehots
    from tpu3drecon.solvers import ba_wtt
    from tpu3drecon.solvers.bundle_adjust import BAConfig, n_cam_params
    from tpu3drecon.utils.placement import commit

    print("backend:", jax.default_backend(), flush=True)
    deferred = bal_sequential_wtt()
    wcams = tuple(b.wcam for b in deferred.buckets)
    problem = commit(expand_onehots(commit(deferred)))
    wcams = tuple(commit(w) for w in wcams)
    config = BAConfig(cg_maxiter=8, cg_rtol=0.0)
    np_cam = n_cam_params(config)

    # One linearization at the packed params -> real jc/jp/v_inv.
    cams = problem.cameras
    pts_list = []
    for bucket, off in zip(problem.buckets, problem.bucket_offsets):
        g, _, tb, pc = bucket.uv.shape
        block = problem.points3d[off : off + g * pc]
        pts_list.append(jnp.moveaxis(block.reshape(g, pc, 3), 2, 0))
    params = (cams.rmats, cams.tvecs, cams.fx_fy, cams.dist,
              cams.cx_cy_skew, tuple(pts_list))

    @jax.jit
    def lin(params, lam, prob):
        with jax.default_matmul_precision("highest"):
            nb = ba_wtt._linearize(params, lam, prob, config)
        return nb

    t0 = time.time()
    nb = lin(params, jnp.asarray(1e-3, jnp.float32), problem)
    jax.device_get(nb.g_cam[0, 0])
    print(f"linearize compile+run {time.time()-t0:.1f}s", flush=True)

    c_pad = problem.c_pad
    rng = np.random.default_rng(0)
    x0 = commit(jnp.asarray(
        rng.standard_normal((c_pad, np_cam), np.float32)))

    def coupling(variant):
        def f(x, nb, prob, wcams):
            with jax.default_matmul_precision("highest"):
                coup = jnp.zeros_like(x)
                for i, (bn, bucket) in enumerate(
                    zip(nb.buckets, prob.buckets)
                ):
                    g, _, tb, pc = bucket.uv.shape
                    widx = ba_wtt._window_idx(bucket)
                    if variant == "xla":
                        wtx = ba_wtt._wt_times_bucket_w(bn, x, bucket)
                        vw = ba_wtt._sym3_matvec_g(bn.v_inv, wtx)
                        coup = coup + ba_wtt._w_times_bucket_w(
                            bn, vw, bucket, c_pad)
                        continue
                    xw_t = jnp.transpose(
                        ba_wtt._window_rows(x, widx), (0, 2, 1))
                    if variant == "fused":
                        rows = wtt_coupling_rows_fused(
                            xw_t, bucket.onehot, bn.jc, bn.jp, bn.v_inv,
                            np_cam, tb, pc, int(bucket.window))
                    else:
                        rows = wtt_coupling_rows_idx(
                            xw_t, wcams[i], bn.jc, bn.jp, bn.v_inv,
                            np_cam, tb, pc, int(bucket.window))
                    coup = coup + ba_wtt._scatter_rows(
                        jnp.transpose(rows, (0, 2, 1)), widx, c_pad)
                return coup
        return f

    # --- numerics -----------------------------------------------------
    ref = None
    outs = {}
    for variant in ("xla", "fused", "index"):
        f = jax.jit(coupling(variant))
        out = np.asarray(jax.device_get(f(x0, nb, problem, wcams)),
                         np.float64)
        outs[variant] = out
        if variant == "xla":
            ref = out
        else:
            scale = max(np.max(np.abs(ref)), 1e-30)
            print(f"numerics {variant}: max-rel-diff vs xla "
                  f"{np.max(np.abs(out - ref)) / scale:.2e}", flush=True)

    # --- timing: matvec chain, two step counts ------------------------
    def chain(variant, steps):
        f = coupling(variant)

        def run(x, nb, prob, wcams):
            def step(carry, _):
                out = f(carry, nb, prob, wcams)
                n = jnp.sum(out * out)
                return out / jnp.sqrt(n + 1e-30), n

            _, ns = lax.scan(step, x, None, length=steps)
            return ns

        return jax.jit(run)

    fns = {}
    for variant in ("xla", "fused", "index"):
        for steps in (4, 20):
            fns[(variant, steps)] = chain(variant, steps)
    for (variant, steps), f in fns.items():
        t0 = time.time()
        jax.device_get(f(x0, nb, problem, wcams)[0])
        print(f"compile {variant}/{steps}: {time.time()-t0:.1f}s",
              flush=True)

    totals: dict = {}
    for _ in range(6):
        for key, f in fns.items():
            t0 = time.time()
            jax.device_get(f(x0, nb, problem, wcams)[0])
            totals.setdefault(key, []).append(time.time() - t0)
    for variant in ("xla", "fused", "index"):
        t4 = sorted(totals[(variant, 4)])[3] * 1e3
        t20 = sorted(totals[(variant, 20)])[3] * 1e3
        per = (t20 - t4) / 16.0
        overhead = t4 - 4 * per
        print(f"timing {variant}: {per:.2f} ms/matvec "
              f"(T4 {t4:.1f} T20 {t20:.1f} overhead {overhead:.1f})",
              flush=True)


if __name__ == "__main__":
    main()
