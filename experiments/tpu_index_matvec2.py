"""Attribute the index-matvec kernel's 8 ms (vs its ~0.6 ms stream floor).

tpu_index_matvec.py: the index kernel ties XLA (8.03 vs 7.58 ms/matvec)
— deleting the 2 GB one-hot stream was fully eaten by kernel
inefficiency.  Suspects: (a) per-grid-step overhead (1862 steps at
nb=512), (b) MXU lane waste (M=8 dots at HIGHEST = 6 passes), (c) the
iota-compare one-hot build on the VPU.  This grid times a parameterized
LOCAL copy of the kernel over:

  nb        512 / 896 / 1792      (grid steps 1862 / 1064 / 532)
  prec      highest / high / default   (6 / 3 / 1 MXU passes; timing only
                                        — default is numerically wrong)
  build     index / const        (const skips the iota build: timing only)
  keep      True / False         (keep per-t oh tiles vs rebuild in ph2)

Coupling product only (no scatter/window ops), carry-dependent chains,
two step counts to solve out call overhead.

Run: cd /root/repo && python experiments/tpu_index_matvec2.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tpu3drecon.benchmark.balscale import bal_sequential_wtt
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
            return ba_wtt._linearize(params, lam, prob, config)

    t0 = time.time()
    nb_lin = lin(params, jnp.asarray(1e-3, jnp.float32), problem)
    jax.device_get(nb_lin.g_cam[0, 0])
    print(f"linearize compile+run {time.time()-t0:.1f}s", flush=True)

    PRECS = {
        "highest": lax.Precision.HIGHEST,
        "high": lax.Precision.HIGH,
        "default": lax.Precision.DEFAULT,
    }

    def make_kernel(np_cam, tb, window, prec, build, keep):
        precision = PRECS[prec]

        def kernel(xw_ref, wcam_ref, jc_ref, jp_ref, vinv_ref, out_ref):
            j = pl.program_id(1)
            acc_t = xw_ref.dtype
            xw = xw_ref[0]
            nb = wcam_ref.shape[2]
            w_iota = jax.lax.broadcasted_iota(jnp.int32, (window, nb), 0)

            def oh_t(t):
                if build == "const":
                    return jnp.full((window, nb), 0.00390625, acc_t)
                idx = wcam_ref[0, t, :]
                return (w_iota == idx[None, :]).astype(acc_t)

            wtx = [None, None, None]
            oh_tiles = []
            jc0_tiles = []
            jc1_tiles = []
            jp_tiles = []
            for t in range(tb):
                oh = oh_t(t)
                if keep:
                    oh_tiles.append(oh)
                xg = jax.lax.dot_general(
                    xw, oh,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=acc_t,
                    precision=precision,
                )
                jc0 = jc_ref[:np_cam, 0, t, :]
                jc1 = jc_ref[np_cam:, 0, t, :]
                jc0_tiles.append(jc0)
                jc1_tiles.append(jc1)
                s0 = jnp.sum(jc0 * xg, axis=0)
                s1 = jnp.sum(jc1 * xg, axis=0)
                jp_t = jp_ref[:, 0, t, :]
                jp_tiles.append(jp_t)
                for l in range(3):
                    part = jp_t[l] * s0 + jp_t[3 + l] * s1
                    wtx[l] = part if wtx[l] is None else wtx[l] + part

            v = vinv_ref[0]
            y0 = v[0] * wtx[0] + v[1] * wtx[1] + v[2] * wtx[2]
            y1 = v[1] * wtx[0] + v[3] * wtx[1] + v[4] * wtx[2]
            y2 = v[2] * wtx[0] + v[4] * wtx[1] + v[5] * wtx[2]

            acc = None
            for t in range(tb):
                jp_t = jp_tiles[t]
                s0p = jp_t[0] * y0 + jp_t[1] * y1 + jp_t[2] * y2
                s1p = jp_t[3] * y0 + jp_t[4] * y1 + jp_t[5] * y2
                z = jc0_tiles[t] * s0p[None] + jc1_tiles[t] * s1p[None]
                oh = oh_tiles[t] if keep else oh_t(t)
                part = jax.lax.dot_general(
                    z, oh,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=acc_t,
                    precision=precision,
                )
                acc = part if acc is None else acc + part

            @pl.when(j == 0)
            def _():
                out_ref[0] = acc

            @pl.when(j != 0)
            def _():
                out_ref[0] = out_ref[0] + acc

        return kernel

    def coupling_rows(xw_t, wcam, jc, jp, v_inv, *, tb, pc, window,
                      nb, prec, build, keep):
        g = wcam.shape[0]
        jb = pc // nb
        kernel = make_kernel(np_cam, tb, window, prec, build, keep)
        return pl.pallas_call(
            kernel,
            grid=(g, jb),
            in_specs=[
                pl.BlockSpec((1, np_cam, window), lambda gg, j: (gg, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tb, nb), lambda gg, j: (gg, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * np_cam, 1, tb, nb),
                             lambda gg, j: (0, gg, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((6, 1, tb, nb), lambda gg, j: (0, gg, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 6, nb), lambda gg, j: (gg, 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, np_cam, window),
                                   lambda gg, j: (gg, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((g, np_cam, window), xw_t.dtype),
        )(
            xw_t,
            wcam.reshape(g, tb, pc).astype(jnp.int32),
            jc,
            jp,
            jnp.transpose(v_inv, (1, 0, 2)),
        )

    c_pad = problem.c_pad
    rng = np.random.default_rng(0)
    x0 = commit(jnp.asarray(
        rng.standard_normal((c_pad, np_cam), np.float32)))

    def coupling(variant):
        nb, prec, build, keep = variant

        def f(x, nbk, prob, wcams):
            with jax.default_matmul_precision("highest"):
                coup = jnp.zeros_like(x)
                for i, (bn, bucket) in enumerate(
                    zip(nbk.buckets, prob.buckets)
                ):
                    g, _, tb, pc = bucket.uv.shape
                    widx = ba_wtt._window_idx(bucket)
                    xw_t = jnp.transpose(
                        ba_wtt._window_rows(x, widx), (0, 2, 1))
                    nb_i = next(
                        (k for k in range(min(nb, pc), 127, -128)
                         if pc % k == 0 and k % 128 == 0), pc)
                    rows = coupling_rows(
                        xw_t, wcams[i], bn.jc, bn.jp, bn.v_inv,
                        tb=tb, pc=pc, window=int(bucket.window),
                        nb=nb_i, prec=prec, build=build, keep=keep)
                    coup = coup + ba_wtt._scatter_rows(
                        jnp.transpose(rows, (0, 2, 1)), widx, c_pad)
                return coup
        return f

    variants = [
        (512, "highest", "index", True),   # = committed kernel
        (896, "highest", "index", True),
        (896, "highest", "index", False),
        (512, "default", "index", True),
        (512, "highest", "const", True),
        (896, "default", "index", True),
    ]

    def chain(variant, steps):
        f = coupling(variant)

        def run(x, nbk, prob, wcams):
            def step(carry, _):
                out = f(carry, nbk, prob, wcams)
                n = jnp.sum(out * out)
                return out / jnp.sqrt(n + 1e-30), n

            _, ns = lax.scan(step, x, None, length=steps)
            return ns

        return jax.jit(run)

    fns = {}
    for v in variants:
        for steps in (4, 20):
            fns[(v, steps)] = chain(v, steps)
    for (v, steps), f in fns.items():
        t0 = time.time()
        jax.device_get(f(x0, nb_lin, problem, wcams)[0])
        print(f"compile {v}/{steps}: {time.time()-t0:.1f}s", flush=True)

    totals: dict = {}
    for _ in range(6):
        for key, f in fns.items():
            t0 = time.time()
            jax.device_get(f(x0, nb_lin, problem, wcams)[0])
            totals.setdefault(key, []).append(time.time() - t0)
    for v in variants:
        t4 = sorted(totals[(v, 4)])[3] * 1e3
        t20 = sorted(totals[(v, 20)])[3] * 1e3
        per = (t20 - t4) / 16.0
        print(f"timing nb={v[0]} prec={v[1]} build={v[2]} keep={v[3]}: "
              f"{per:.2f} ms/matvec", flush=True)


if __name__ == "__main__":
    main()
