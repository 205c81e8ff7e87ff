"""Bisect _cam_planes_w on TPU with REAL problem arrays + full reductions.

First version of this file sliced the outputs (sum(out[:, 0, :1])), which
let XLA push the slice through the dot AND the gather — every case
measured ~3 ms and meant nothing.  All reductions here are full mask-sums.

The engine-context measurements (tpu_wtt_profile.py) show _cam_planes_w at
~0.7 s/call while the identical einsum shapes bench at ~7 ms
(tpu_batched_matmul.py).  The remaining suspects: the (G, Wb) tile gather
feeding the einsum, the trailing reshape, and XLA's fusion of them.

  python experiments/tpu_window_ops.py [n_cams] [--cpu]
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
    import numpy as np

    from tpu3drecon.solvers import ba_wtt as W
    from tpu3drecon.utils.timing import device_sync

    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        from tpu3drecon.dataset.synthetic import (
            make_sequential_scene,
            perturb_scene,
            scene_to_ba_problem,
        )
        from tpu3drecon.problems.wtt import wtt_from_flat

        scene = make_sequential_scene(
            n_cameras=n_cams, points_per_camera=584, track_span=4, seed=7,
        )
        noisy = perturb_scene(scene, seed=8, point2d_noise=0.5)
        flat, _ = scene_to_ba_problem(noisy, observed=scene, dtype=jnp.float32)
        wtt = wtt_from_flat(flat, point_chunk=512)
        bkt = max(wtt.buckets, key=lambda b: b.mask.size)
        g, _, tb, pc = bkt.uv.shape
        print(
            f"dominant bucket uv {bkt.uv.shape} window {bkt.window} "
            f"onehot {bkt.onehot.shape}",
            flush=True,
        )
        rng = np.random.default_rng(0)
        table_pad = jnp.asarray(rng.standard_normal((wtt.c_pad, 19)), jnp.float32)
        mask_out = jnp.asarray(
            rng.standard_normal((g, 19, tb, pc)), jnp.float32
        )
    bkt = jax.device_put(bkt)
    table_pad = jax.device_put(table_pad)
    mask_out = jax.device_put(mask_out)

    def bench(name, body, *args, reps=10):
        def fn(*a):
            s, _ = jax.lax.scan(
                lambda acc, _: (body(acc, *a), None),
                jnp.float32(0), None, length=reps,
            )
            return s

        jfn = jax.jit(fn)
        out = jfn(*args)
        device_sync(out)
        t0 = time.time()
        out = jfn(*args)
        device_sync(out)
        print(json.dumps({
            "case": name,
            "per_rep_ms": round((time.time() - t0) / reps * 1e3, 2),
        }), flush=True)

    hp = jax.lax.Precision.HIGHEST

    # A. the engine op verbatim.
    def eng(acc, tp, b, m):
        cp = W._cam_planes_w(tp + 0.0 * acc, b)
        return jnp.sum(cp * m)

    bench("engine_cam_planes_w", eng, table_pad, bkt, mask_out)

    # B. barrier between gather and einsum.
    def barrier(acc, tp, b, m):
        widx = W._window_idx(b)
        tw = W._window_rows(tp + 0.0 * acc, widx)
        tw = jax.lax.optimization_barrier(tw)
        planes = jnp.einsum("gwd,gwn->gdn", tw, b.onehot, precision=hp)
        return jnp.sum(planes.reshape(g, 19, tb, pc) * m)

    bench("gather_BARRIER_einsum", barrier, table_pad, bkt, mask_out)

    # C. einsum only (tw precomputed input).
    widx0 = jax.jit(W._window_idx)(bkt)
    tw0 = jax.jit(W._window_rows)(table_pad, widx0)
    tw0 = jax.device_put(tw0)

    def eonly(acc, tw, b, m):
        planes = jnp.einsum(
            "gwd,gwn->gdn", tw + 0.0 * acc, b.onehot, precision=hp
        )
        return jnp.sum(planes.reshape(g, 19, tb, pc) * m)

    bench("einsum_reshape_only", eonly, tw0, bkt, mask_out)

    # D. einsum without the trailing reshape (mask reshaped instead).
    m2 = mask_out.reshape(g, 19, tb * pc)

    def eflat(acc, tw, b, m):
        planes = jnp.einsum(
            "gwd,gwn->gdn", tw + 0.0 * acc, b.onehot, precision=hp
        )
        return jnp.sum(planes * m)

    bench("einsum_flat_only", eflat, tw0, bkt, m2)

    # E. gather only.
    def gonly(acc, tp, b):
        widx = W._window_idx(b)
        tw = W._window_rows(tp + 0.0 * acc, widx)
        return jnp.sum(tw * tw)

    bench("gather_only", gonly, table_pad, bkt)

    # F. einsum with a RANDOM DENSE operand instead of the real one-hot
    #    (same shape): is the one-hot ARRAY itself (layout? sparsity?) the
    #    problem, or the op?
    oh_rand = jax.device_put(
        jnp.asarray(
            (np.random.default_rng(1).random(bkt.onehot.shape) < 0.004),
            jnp.float32,
        )
    )

    def erand(acc, tw, oh, m):
        planes = jnp.einsum("gwd,gwn->gdn", tw + 0.0 * acc, oh, precision=hp)
        return jnp.sum(planes * m)

    bench("einsum_rand_onehot", erand, tw0, oh_rand, m2)


if __name__ == "__main__":
    main()
