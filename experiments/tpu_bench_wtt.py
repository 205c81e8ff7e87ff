"""Can wtt + index kernels beat the tt engine at the bench headline scale?

The bench headline (100 cams / 100k pts / 200k obs, fixed 30 LM / 8 CG)
runs the tt engine at 0.143 s.  The index kernels (matvec + linearize)
landed for the wtt engine only; at 100 cameras the wtt window covers the
whole camera range (c_pad = 128), so wtt degenerates to tt-with-windows
and the kernels apply.  If wtt+kernels wins, bench.py can switch engines
instead of porting the kernels to the tt layout.

Interleaved A/B at the exact bench config:
  tt (bench engine)  |  wtt xla  |  wtt mv=index  |  wtt mv+lin=index

Run: cd /root/repo && python experiments/tpu_bench_wtt.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    from tpu3drecon.benchmark.medium_config import BENCH_CONFIG, build_problem
    from tpu3drecon.problems.tt import tt_from_flat
    from tpu3drecon.problems.wtt import expand_onehots, wtt_from_flat
    from tpu3drecon.solvers.ba_tt import make_tt_ba_solver
    from tpu3drecon.solvers.ba_wtt import make_wtt_ba_solver
    from tpu3drecon.solvers.bundle_adjust import reprojection_rmse
    from tpu3drecon.utils.placement import commit

    print("backend:", jax.default_backend(), flush=True)
    flat = build_problem(on_host=True)
    tt = commit(tt_from_flat(flat, point_block=64))
    wtt = commit(expand_onehots(wtt_from_flat(flat)))
    flat_dev = commit(flat)
    for b in wtt.buckets:
        print(f"wtt bucket: uv {tuple(b.uv.shape)} window {b.window}",
              flush=True)

    runs = [
        ("tt", make_tt_ba_solver(BENCH_CONFIG), tt),
        ("wtt xla", make_wtt_ba_solver(BENCH_CONFIG), wtt),
        ("wtt mv=index", make_wtt_ba_solver(
            BENCH_CONFIG._replace(matvec_kernel="index")), wtt),
        ("wtt mv+lin=index", make_wtt_ba_solver(
            BENCH_CONFIG._replace(
                matvec_kernel="index", linearize_kernel="index")), wtt),
    ]
    for tag, solver, prob in runs:
        t0 = time.time()
        cams, pts, st = solver(prob)
        jax.block_until_ready(pts)
        float(jax.device_get(st.loss))
        print(f"compile {tag}: {time.time()-t0:.1f}s", flush=True)
    results = {}
    for _ in range(5):
        for tag, solver, prob in runs:
            t0 = time.time()
            cams, pts, st = solver(prob)
            jax.block_until_ready(pts)
            float(jax.device_get(st.loss))
            results.setdefault(tag, []).append(time.time() - t0)
    for tag, solver, prob in runs:
        ts = sorted(results[tag])
        cams, pts, st = solver(prob)
        rmse = float(jax.device_get(reprojection_rmse(flat_dev, cams, pts)))
        print(f"RESULT {tag:18s}: median {ts[2]:.4f}s "
              f"(min {ts[0]:.4f} max {ts[-1]:.4f}) rmse {rmse:.3e} "
              f"accepted {int(jax.device_get(st.accepted))}/30", flush=True)


if __name__ == "__main__":
    main()
