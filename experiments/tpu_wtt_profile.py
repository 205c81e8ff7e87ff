"""Piecewise timing of the wtt engine on TPU: where do 73 s/LM-iter go?

The full-scale run (balscale_dryrun.py tpu_wtt: 1712 cams / 1M pts) measured
73.5 s/LM-iter vs the grid engine's 1.80 — ~40x off any roofline estimate.
This ladder times the engine's pieces in isolation (each in ONE dispatch via
a carry-dependent lax.scan, per the measurement rules in CLAUDE.md) at a
configurable scale to find the degenerate op.

  python experiments/tpu_wtt_profile.py [n_cameras] [--cpu]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_cams = int(args[0]) if args else 428
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tpu3drecon.solvers import ba_wtt as W
    from tpu3drecon.solvers.bundle_adjust import BAConfig
    from tpu3drecon.utils.compile_cache import enable_compilation_cache
    from tpu3drecon.utils.timing import device_sync

    enable_compilation_cache()

    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        from tpu3drecon.dataset.synthetic import (
            make_sequential_scene,
            perturb_scene,
            scene_to_ba_problem,
        )
        from tpu3drecon.problems.wtt import wtt_from_flat

        t0 = time.time()
        scene = make_sequential_scene(
            n_cameras=n_cams, points_per_camera=584, track_span=4, seed=7,
        )
        noisy = perturb_scene(scene, seed=8, point2d_noise=0.5)
        flat, _ = scene_to_ba_problem(noisy, observed=scene, dtype=jnp.float32)
        wtt = wtt_from_flat(flat, point_chunk=512)
        slots = sum(b.mask.size for b in wtt.buckets)
        print(
            f"built {wtt.n_cameras} cams (c_pad {wtt.c_pad}) "
            f"{wtt.n_real_points} pts {slots} slots in {time.time()-t0:.0f}s "
            f"windows={[b.window for b in wtt.buckets]}",
            flush=True,
        )
    from tpu3drecon.utils.placement import commit

    wtt = commit(wtt)

    config = BAConfig(maxiter=3, gtol=0.0, ftol=0.0, cg_maxiter=8, cg_rtol=1e-4)
    cams = wtt.cameras
    pts_list = []
    for bucket, off in zip(wtt.buckets, wtt.bucket_offsets):
        g, _, tb, pc = bucket.uv.shape
        block = wtt.points3d[off : off + g * pc]
        pts_list.append(jnp.moveaxis(block.reshape(g, pc, 3), 2, 0))
    pts_list = tuple(pts_list)
    params = (cams.rmats, cams.tvecs, cams.fx_fy, cams.dist, pts_list)

    def timed(name, fn, *fargs):
        t0 = time.time()
        out = fn(*fargs)
        device_sync(out)
        compile_s = time.time() - t0
        t0 = time.time()
        out = fn(*fargs)
        device_sync(out)
        run_s = time.time() - t0
        print(json.dumps({
            "piece": name, "compile_s": round(compile_s, 1),
            "run_s": round(run_s, 4),
        }), flush=True)
        return out

    mp = jax.default_matmul_precision

    # All pieces take the problem as an ARG: closing over it would embed
    # the bucket arrays as HLO constants, which the remote-compile tunnel
    # rejects (HTTP 413) beyond ~100 MB.
    # 1. Cost x10 (carry-dependent: shift points by the running total).
    @jax.jit
    def cost10(params, wtt):
        with mp("highest"):
            def body(c, _):
                r, t, f, d, pl = params
                pl2 = tuple(p + 0.0 * c for p in pl)
                c2 = W._cost((r, t, f, d, pl2), wtt, config)
                return c2, None

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=10)
            return c

    timed("cost_x10", cost10, params, wtt)

    # 2. Linearize x4 (carry-dependent via lam).
    @jax.jit
    def lin4(params, wtt):
        with mp("highest"):
            def body(lam, _):
                nb = W._linearize(params, lam, wtt, config)
                return 1e-4 + 0.0 * jnp.sum(nb.g_cam), None

            lam, _ = jax.lax.scan(body, jnp.float32(1e-4), None, length=4)
            return lam

    timed("linearize_x4", lin4, params, wtt)

    # 3. Schur matvec x20 (carry-dependent: x <- Sx / |Sx|).
    @jax.jit
    def mv20(params, wtt):
        with mp("highest"):
            nb = W._linearize(params, jnp.float32(1e-4), wtt, config)
            x0 = jnp.ones_like(nb.g_cam)

            def body(x, _):
                sx = W._schur_matvec(nb, x, wtt)
                return sx / (jnp.linalg.norm(sx) + 1e-30), None

            x, _ = jax.lax.scan(body, x0, None, length=20)
            return jnp.sum(x)

    timed("lin_plus_matvec_x20", mv20, params, wtt)

    # 4. The one-hot contraction alone x20: cam_planes for every bucket.
    @jax.jit
    def camplanes20(params, wtt):
        with mp("highest"):
            r, t, f, d, _ = params
            table = W._cam_table(r, t, f, cams.cx_cy_skew, d)
            tp = jnp.zeros((wtt.c_pad, table.shape[1]), table.dtype)
            tp = tp.at[: table.shape[0]].set(table)

            def body(acc, _):
                s = acc
                for b in wtt.buckets:
                    cp = W._cam_planes_w(tp + 0.0 * acc, b)
                    s = s + jnp.sum(cp[:, 0, 0, 0])
                return s, None

            s, _ = jax.lax.scan(body, jnp.float32(0), None, length=20)
            return s

    timed("cam_planes_x20", camplanes20, params, wtt)

    # 5. Reduce-to-cams alone x20 (8 planes, the matvec's W^T shape).
    @jax.jit
    def reduce20(params, wtt):
        with mp("highest"):
            def body(acc, _):
                s = acc
                for b in wtt.buckets:
                    g, _, tb, pc = b.uv.shape
                    planes = [
                        b.mask * (1.0 + 0.0 * acc) for _ in range(8)
                    ]
                    rows = W._reduce_to_cams_w(planes, b, wtt.c_pad)
                    s = s + jnp.sum(rows[0])
                return s, None

            s, _ = jax.lax.scan(body, jnp.float32(0), None, length=20)
            return s

    timed("reduce_to_cams8_x20", reduce20, params, wtt)

    # 6. Full solve, 3 LM iters.
    solver = W.make_wtt_ba_solver(config)
    t0 = time.time()
    c_, p_, st = solver(wtt)
    device_sync(st.loss)
    compile_s = time.time() - t0
    t0 = time.time()
    c_, p_, st = solver(wtt)
    device_sync(st.loss)
    run_s = time.time() - t0
    print(json.dumps({
        "piece": "solve_3lm", "compile_s": round(compile_s, 1),
        "run_s": round(run_s, 3), "s_per_lm_iter": round(run_s / 3, 3),
        "loss": float(jax.device_get(st.loss)),
    }), flush=True)


if __name__ == "__main__":
    main()
