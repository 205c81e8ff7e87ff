"""Cap-sensitivity of the split_windows class coalescing (host-only).

The uncapped hub split produced 23 window classes (23 WTTBuckets = 23
sets of Pallas kernel variants) and a 112 s BAL compile+first vs 26 s
unsplit (experiments/tpu_split_windows.py).  This packs the BAL-scale
sequential and hub problems at several per-bucket class caps and prints
bucket counts + selection-MAC totals (window rows INCLUDING global
tiles x slots — the quantity the round-4b rate model says is ~80-90% of
the marginal LM-iter cost), so the default `_SPLIT_MAX_CLASSES` is a
measured choice, not a guess.

Run: cd /root/repo && JAX_PLATFORMS=cpu python experiments/wtt_split_cap_stats.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tpu3drecon.dataset.synthetic import (
        make_hub_scene,
        make_sequential_scene,
        perturb_scene,
        scene_to_ba_problem,
    )
    from tpu3drecon.problems.wtt import CAM_TILE, wtt_from_flat

    def flat_for(kind):
        kw = dict(n_cameras=1712, points_per_camera=584, track_span=4, seed=7)
        scene = (
            make_sequential_scene(**kw)
            if kind == "seq"
            else make_hub_scene(hub_fraction=0.05, hub_obs=4000, **kw)
        )
        noisy = perturb_scene(scene, seed=8, point2d_noise=0.5)
        flat, _ = scene_to_ba_problem(noisy, observed=scene, dtype=jnp.float32)
        return flat

    for kind in ("seq", "hub"):
        flat = flat_for(kind)
        print(f"== {kind} ==", flush=True)
        for cap in (0, 2, 3, 4, 6, 99):
            sw = False if cap == 0 else cap
            p = wtt_from_flat(
                flat, point_chunk=512, defer_onehot=True, split_windows=sw
            )
            macs = sum(
                (b.window + b.global_tiles * CAM_TILE)
                * b.uv.shape[0] * b.uv.shape[2] * b.uv.shape[3]
                for b in p.buckets
            )
            wins = [
                (b.window, b.global_tiles, b.uv.shape[0]) for b in p.buckets
            ]
            print(
                f"  cap {cap:2d}: buckets {len(p.buckets):2d} "
                f"sel-MACs {macs / 1e9:6.2f}G  {wins}",
                flush=True,
            )


if __name__ == "__main__":
    main()
