"""Term-STACKED selection dots: fold the 3 bf16 split passes into one MXU dot.

The exact (f32-faithful) index kernels pay ``terms=3`` SEPARATE
DEFAULT-precision dots per selection (wtt_matvec._matvec_kernel_idx.
split_dot).  Each dot's non-contracted operand is only np=8 wide — if
the MXU quantizes to 128-lane tiles, each term pass wastes 15/16 of the
array and three passes cost 3 full tile sweeps.  Stacking the three
bf16 split terms along the WIDTH axis ((3*np, W) @ (W, NB) instead of
3 x (np, W) @ (W, NB)) keeps the arithmetic BIT-IDENTICAL (same partial
products, same f32 add order: out[:np] + out[np:2np] + out[2np:]) while
tripling lane occupancy — a candidate ~3x cut of the dominant CG-matvec
cost if the tile-quantization hypothesis holds, a wash if MXU time
scales with true MACs.

Method: the REAL wtt_coupling_rows_idx vs an in-file copy with stacked
split dots, BAL bucket shapes (G=48, tb=4, Pc=2560, W=256, np=8),
carry-dependent scans at two step counts (4, 16) to solve out per-call
dispatch (CLAUDE.md), mask-sum reduction.  Prints max|A-B| first — the
variants must agree EXACTLY.

Run: cd /root/repo && python experiments/tpu_term_stack.py
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

    from tpu3drecon.ops.pallas.wtt_matvec import wtt_coupling_rows_idx

    print("backend:", jax.default_backend(), flush=True)
    G, TB, PC, W, NP = 48, 4, 2560, 256, 8
    rng = np.random.default_rng(0)
    jc = jnp.asarray(rng.normal(size=(2 * NP, G, TB, PC)).astype(np.float32))
    jp = jnp.asarray(rng.normal(size=(6, G, TB, PC)).astype(np.float32))
    v_inv = jnp.asarray(rng.normal(size=(6, G, PC)).astype(np.float32))
    wcam_np = rng.integers(0, W, size=(G, TB * PC)).astype(np.int32)
    wcam_np[rng.random(size=wcam_np.shape) < 0.1] = -1  # pad slots
    wcam = jnp.asarray(wcam_np)
    xw0 = jnp.asarray(rng.normal(size=(G, NP, W)).astype(np.float32))
    rmask = jnp.asarray(rng.normal(size=(G, NP, W)).astype(np.float32))

    def _matvec_kernel_stacked(
        xw_ref, wcam_ref, jc_ref, jp_ref, vinv_ref, out_ref,
        *, np_cam, tb, window, terms,
    ):
        j = pl.program_id(1)
        acc_t = xw_ref.dtype
        xw = xw_ref[0]
        nb = wcam_ref.shape[2]
        w_iota = jax.lax.broadcasted_iota(jnp.int32, (window, nb), 0)

        def split_dot(x, oh_bf, transpose_oh):
            dims = ((((1,), (1,)) if transpose_oh else ((1,), (0,))),
                    ((), ()))
            hs = []
            rem = x
            for _ in range(terms):
                h = rem.astype(jnp.bfloat16)
                rem = rem - h.astype(acc_t)
                hs.append(h)
            out = jax.lax.dot_general(
                jnp.concatenate(hs, axis=0), oh_bf,
                dimension_numbers=dims,
                preferred_element_type=acc_t,
                precision=jax.lax.Precision.DEFAULT,
            )
            m = x.shape[0]
            acc = out[:m]
            for i in range(1, terms):
                acc = acc + out[i * m : (i + 1) * m]
            return acc

        def oh_t(t):
            idx = wcam_ref[0, t, :]
            return (w_iota == idx[None, :]).astype(jnp.bfloat16)

        wtx = [None, None, None]
        for t in range(tb):
            xg = split_dot(xw, oh_t(t), transpose_oh=False)
            s0 = jnp.sum(jc_ref[:np_cam, 0, t, :] * xg, axis=0)
            s1 = jnp.sum(jc_ref[np_cam:, 0, t, :] * xg, axis=0)
            jp_t = jp_ref[:, 0, t, :]
            for l in range(3):
                part = jp_t[l] * s0 + jp_t[3 + l] * s1
                wtx[l] = part if wtx[l] is None else wtx[l] + part
        v = vinv_ref[0]
        y0 = v[0] * wtx[0] + v[1] * wtx[1] + v[2] * wtx[2]
        y1 = v[1] * wtx[0] + v[3] * wtx[1] + v[4] * wtx[2]
        y2 = v[2] * wtx[0] + v[4] * wtx[1] + v[5] * wtx[2]
        acc = None
        for t in range(tb):
            jp_t = jp_ref[:, 0, t, :]
            s0p = jp_t[0] * y0 + jp_t[1] * y1 + jp_t[2] * y2
            s1p = jp_t[3] * y0 + jp_t[4] * y1 + jp_t[5] * y2
            z = (jc_ref[:np_cam, 0, t, :] * s0p[None]
                 + jc_ref[np_cam:, 0, t, :] * s1p[None])
            part = split_dot(z, oh_t(t), transpose_oh=True)
            acc = part if acc is None else acc + part

        @pl.when(j == 0)
        def _():
            out_ref[0] = acc

        @pl.when(j != 0)
        def _():
            out_ref[0] = out_ref[0] + acc

    @functools.partial(jax.jit, static_argnames=("terms",))
    def coupling_stacked(xw_t, wcam, jc, jp, v_inv, terms=3):
        g = wcam.shape[0]
        nb = 640  # same block the library picks at these shapes
        jb = PC // nb
        kernel = functools.partial(
            _matvec_kernel_stacked, np_cam=NP, tb=TB, window=W, terms=terms
        )
        return pl.pallas_call(
            kernel,
            grid=(g, jb),
            in_specs=[
                pl.BlockSpec((1, NP, W), lambda gg, j: (gg, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TB, nb), lambda gg, j: (gg, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * NP, 1, TB, nb), lambda gg, j: (0, gg, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((6, 1, TB, nb), lambda gg, j: (0, gg, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 6, nb), lambda gg, j: (gg, 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, NP, W), lambda gg, j: (gg, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((g, NP, W), xw_t.dtype),
            interpret=False,
        )(
            xw_t, wcam.reshape(g, TB, PC), jc, jp,
            jnp.transpose(v_inv, (1, 0, 2)),
        )

    def lib_call(xw_t, terms):
        return wtt_coupling_rows_idx(
            xw_t, wcam, jc, jp, v_inv, NP, TB, PC, W, terms=terms
        )

    # Exactness: stacked must reproduce the library kernel EXACTLY.
    a = jax.device_get(lib_call(xw0, 3))
    b = jax.device_get(coupling_stacked(xw0, wcam, jc, jp, v_inv, terms=3))
    print(f"max|lib - stacked| = {np.abs(a - b).max():.3e} "
          f"(scale {np.abs(a).max():.3e})", flush=True)

    variants = {
        "lib-t3": lambda x: lib_call(x, 3),
        "stack-t3": lambda x: coupling_stacked(
            x, wcam, jc, jp, v_inv, terms=3
        ),
        "lib-t1": lambda x: lib_call(x, 1),
        "stack-t1": lambda x: coupling_stacked(
            x, wcam, jc, jp, v_inv, terms=1
        ),
    }

    def make_scan(fn, steps):
        @jax.jit
        def run(x0):
            def step(x, _):
                rows = fn(x)
                # carry-dependence + full mask-sum (CLAUDE.md traps)
                s = jnp.sum(rows * rmask)
                return x * (1.0 + 1e-30 * s), s

            _, ss = lax.scan(step, x0, None, length=steps)
            return ss

        return run

    fns = {
        (name, steps): make_scan(fn, steps)
        for name, fn in variants.items()
        for steps in (4, 16)
    }
    for key, fn in fns.items():
        t0 = time.time()
        jax.device_get(fn(xw0)[0])
        print(f"compile {key}: {time.time()-t0:.1f}s", flush=True)
    totals = {}
    for _ in range(7):
        for key, fn in fns.items():
            t0 = time.time()
            jax.device_get(fn(xw0)[0])
            totals.setdefault(key, []).append(time.time() - t0)
    print("\nper-call (dispatch solved out):", flush=True)
    for name in variants:
        t4 = sorted(totals[(name, 4)])[3]
        t16 = sorted(totals[(name, 16)])[3]
        print(f"  {name:9s}: {(t16 - t4) / 12.0 * 1e3:6.3f} ms", flush=True)


if __name__ == "__main__":
    main()
