"""Wide-track-span stress: BAL-scale wtt with 12-camera tracks.

The canonical BAL-scale scene uses track_span=4 (short Ladybug-like
tracks).  Real sequential captures carry longer tracks — more track-
length buckets (2..12), taller slot tables (Tb up to 12), and wider
camera windows.  This proves the wtt packer + batched linearization
handle that regime at full scale and reports the cost.

Run: cd /root/repo && python experiments/tpu_wtt_widespan.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    from tpu3drecon.benchmark.balscale import bal_sequential_wtt
    from tpu3drecon.problems.wtt import expand_onehots
    from tpu3drecon.solvers.ba_wtt import make_wtt_ba_solver
    from tpu3drecon.solvers.bundle_adjust import BAConfig
    from tpu3drecon.utils.placement import commit

    print("backend:", jax.default_backend(), flush=True)
    t0 = time.time()
    # ~195 points/cam x up-to-12-camera tracks ~= the same 3.8M-obs class.
    wtt = bal_sequential_wtt(track_span=12, points_per_camera=195)
    build_s = time.time() - t0
    shapes = [(tuple(b.uv.shape), int(b.window)) for b in wtt.buckets]
    print(
        f"built wide-span problem in {build_s:.0f}s: {wtt.n_cameras} cams "
        f"(c_pad {wtt.c_pad}), {wtt.n_real_points} pts, "
        f"buckets (uv shape, window)={shapes}",
        flush=True,
    )
    wtt = expand_onehots(commit(wtt))
    jax.device_get(wtt.buckets[0].uv[0, 0, 0, 0])
    onehot_gb = sum(
        b.onehot.size * b.onehot.dtype.itemsize for b in wtt.buckets
    ) / 1e9

    config = BAConfig(maxiter=3, gtol=0.0, ftol=0.0, cg_maxiter=8,
                      cg_rtol=0.0)
    solver = make_wtt_ba_solver(config)
    t0 = time.time()
    out = solver(wtt)
    loss = float(jax.device_get(out[2].loss))
    compile_s = time.time() - t0
    t0 = time.time()
    out = solver(wtt)
    loss = float(jax.device_get(out[2].loss))
    run_s = time.time() - t0
    n_obs = int(sum(float(b.mask.sum()) for b in wtt.buckets))
    print(json.dumps({
        "mode": "tpu_wtt_widespan12", "cams": int(wtt.n_cameras),
        "points": int(wtt.n_real_points), "obs": n_obs,
        "n_buckets": len(wtt.buckets), "onehot_gb": round(onehot_gb, 2),
        "build_s": round(build_s, 1), "compile_s": round(compile_s, 1),
        "run_s": round(run_s, 2), "s_per_lm_iter": round(run_s / 3, 3),
        "loss": loss, "finite": loss == loss,
        "accepted": int(jax.device_get(out[2].accepted)),
    }), flush=True)


if __name__ == "__main__":
    main()
