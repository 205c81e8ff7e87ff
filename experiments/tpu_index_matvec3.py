"""Exact-split index matvec kernel: recover f32 selection at ~3 MXU passes.

tpu_index_matvec2.py attribution: the index kernel's 8 ms is the
HIGHEST-precision 6-pass MXU emulation (DEFAULT single-pass runs the
same kernel in 1.56 ms; a compile-time-constant one-hot that lets the
compiler drop the zero low-terms runs 2.18 ms).  The one-hot is exactly
representable in bf16 ({0,1}), so splitting ONLY the f32 operand into
bf16 hi/mid/lo terms (24 mantissa bits) and running DEFAULT-precision
dots with f32 accumulation is f32-faithful — and unlike the XLA-level
split (destroyed by the bf16 propagation pass, tpu_selection_dot2.py),
Mosaic compiles exactly what we write.

Variants (nb=896, keep=True), numerics vs the XLA two-pass coupling:

  xla      production path (timing re-reference)
  hi6      committed index kernel (HIGHEST)      — expect ~8 ms, 1.7e-7
  split3   3-term bf16 split, DEFAULT dots       — expect ~2.2 ms, ~1e-7
  split2   2-term (16 mantissa bits)             — expect ~1.9 ms, ~1e-5
  bf16     plain DEFAULT (single pass)           — expect ~1.6 ms, ~3e-3

Run: cd /root/repo && python experiments/tpu_index_matvec3.py
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

    def make_kernel(np_cam, tb, window, mode):
        """mode: 'hi6' | 'split3' | 'split2' | 'bf16'."""

        def split_dot(x, oh_bf, transpose_oh):
            """dot(x f32, oh bf16) with DEFAULT passes, f32-faithful for
            one-hot rhs when mode splits enough terms."""
            dims = ((((1,), (1,)) if transpose_oh else ((1,), (0,))),
                    ((), ()))
            if mode == "hi6":
                return jax.lax.dot_general(
                    x, oh_bf.astype(x.dtype), dimension_numbers=dims,
                    preferred_element_type=x.dtype,
                    precision=lax.Precision.HIGHEST)
            if mode == "bf16":
                return jax.lax.dot_general(
                    x.astype(jnp.bfloat16), oh_bf, dimension_numbers=dims,
                    preferred_element_type=x.dtype,
                    precision=lax.Precision.DEFAULT)
            terms = 3 if mode == "split3" else 2
            acc = None
            rem = x
            for _ in range(terms):
                h = rem.astype(jnp.bfloat16)
                rem = rem - h.astype(x.dtype)
                part = jax.lax.dot_general(
                    h, oh_bf, dimension_numbers=dims,
                    preferred_element_type=x.dtype,
                    precision=lax.Precision.DEFAULT)
                acc = part if acc is None else acc + part
            return acc

        def kernel(xw_ref, wcam_ref, jc_ref, jp_ref, vinv_ref, out_ref):
            j = pl.program_id(1)
            acc_t = xw_ref.dtype
            xw = xw_ref[0]
            nb = wcam_ref.shape[2]
            w_iota = jax.lax.broadcasted_iota(jnp.int32, (window, nb), 0)

            wtx = [None, None, None]
            oh_tiles = []
            jc0_tiles = []
            jc1_tiles = []
            jp_tiles = []
            for t in range(tb):
                idx = wcam_ref[0, t, :]
                oh = (w_iota == idx[None, :]).astype(jnp.bfloat16)
                oh_tiles.append(oh)
                xg = split_dot(xw, oh, transpose_oh=False)  # (np, NB)
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
                part = split_dot(z, oh_tiles[t], transpose_oh=True)
                acc = part if acc is None else acc + part

            @pl.when(j == 0)
            def _():
                out_ref[0] = acc

            @pl.when(j != 0)
            def _():
                out_ref[0] = out_ref[0] + acc

        return kernel

    def coupling_rows(xw_t, wcam, jc, jp, v_inv, *, tb, pc, window, mode):
        g = wcam.shape[0]
        nb = next((k for k in range(min(896, pc), 127, -128)
                   if pc % k == 0 and k % 128 == 0), pc)
        jb = pc // nb
        kernel = make_kernel(np_cam, tb, window, mode)
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

    def coupling(mode):
        def f(x, nbk, prob, wcams):
            with jax.default_matmul_precision("highest"):
                coup = jnp.zeros_like(x)
                for i, (bn, bucket) in enumerate(
                    zip(nbk.buckets, prob.buckets)
                ):
                    g, _, tb, pc = bucket.uv.shape
                    widx = ba_wtt._window_idx(bucket)
                    if mode == "xla":
                        wtx = ba_wtt._wt_times_bucket_w(bn, x, bucket)
                        vw = ba_wtt._sym3_matvec_g(bn.v_inv, wtx)
                        coup = coup + ba_wtt._w_times_bucket_w(
                            bn, vw, bucket, c_pad)
                        continue
                    xw_t = jnp.transpose(
                        ba_wtt._window_rows(x, widx), (0, 2, 1))
                    rows = coupling_rows(
                        xw_t, wcams[i], bn.jc, bn.jp, bn.v_inv,
                        tb=tb, pc=pc, window=int(bucket.window), mode=mode)
                    coup = coup + ba_wtt._scatter_rows(
                        jnp.transpose(rows, (0, 2, 1)), widx, c_pad)
                return coup
        return f

    modes = ("xla", "hi6", "split3", "split2", "bf16")

    # --- numerics -----------------------------------------------------
    ref = None
    for mode in modes:
        f = jax.jit(coupling(mode))
        out = np.asarray(jax.device_get(f(x0, nb_lin, problem, wcams)),
                         np.float64)
        if mode == "xla":
            ref = out
            continue
        scale = max(np.max(np.abs(ref)), 1e-30)
        print(f"numerics {mode}: max-rel-diff vs xla "
              f"{np.max(np.abs(out - ref)) / scale:.2e}", flush=True)

    # --- timing -------------------------------------------------------
    def chain(mode, steps):
        f = coupling(mode)

        def run(x, nbk, prob, wcams):
            def step(carry, _):
                out = f(carry, nbk, prob, wcams)
                n = jnp.sum(out * out)
                return out / jnp.sqrt(n + 1e-30), n

            _, ns = lax.scan(step, x, None, length=steps)
            return ns

        return jax.jit(run)

    fns = {}
    for mode in modes:
        for steps in (4, 20):
            fns[(mode, steps)] = chain(mode, steps)
    for (mode, steps), f in fns.items():
        t0 = time.time()
        jax.device_get(f(x0, nb_lin, problem, wcams)[0])
        print(f"compile {mode}/{steps}: {time.time()-t0:.1f}s", flush=True)

    totals: dict = {}
    for _ in range(6):
        for key, f in fns.items():
            t0 = time.time()
            jax.device_get(f(x0, nb_lin, problem, wcams)[0])
            totals.setdefault(key, []).append(time.time() - t0)
    for mode in modes:
        t4 = sorted(totals[(mode, 4)])[3] * 1e3
        t20 = sorted(totals[(mode, 20)])[3] * 1e3
        per = (t20 - t4) / 16.0
        print(f"timing {mode}: {per:.2f} ms/matvec", flush=True)


if __name__ == "__main__":
    main()
