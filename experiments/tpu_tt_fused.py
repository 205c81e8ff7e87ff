"""Interleaved A/B: XLA tt linearization vs fused Pallas kernels.

Round-3 lead (VERDICT #3): the ~120-165 contribution planes of the tt
linearization round-trip HBM; ops/pallas/tt_linearize.py fuses their
production into the one-hot contraction.  TPU session throughput drifts
~±10%, so only in-process interleaved timing is trustworthy (RESULTS.md).

Run: cd /root/repo && python experiments/tpu_tt_fused.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(reps: int = 5) -> None:
    import jax

    from tpu3drecon.benchmark.medium_config import BENCH_CONFIG, build_problem
    from tpu3drecon.problems.tt import tt_from_flat
    from tpu3drecon.solvers.ba_tt import make_tt_ba_solver
    from tpu3drecon.solvers.bundle_adjust import reprojection_rmse
    from tpu3drecon.utils.placement import commit
    from tpu3drecon.utils.timing import device_sync

    print("backend:", jax.default_backend(), flush=True)
    flat_host = build_problem(on_host=True)
    problem = commit(tt_from_flat(flat_host))
    # Bit-packed tiles are (C, nb // 8) uint8 blocks; Mosaic wants 128-lane
    # minors, so the packed layout needs 1024-slot point blocks.
    problem_bits = commit(
        tt_from_flat(flat_host, onehot_dtype="bits", point_block=1024)
    )

    runs = {
        "xla": (make_tt_ba_solver(BENCH_CONFIG), problem),
        "fused-lin": (make_tt_ba_solver(BENCH_CONFIG, kernels=True), problem),
        "fused-full": (
            make_tt_ba_solver(BENCH_CONFIG, kernels="full"), problem
        ),
        "fused-bits": (
            make_tt_ba_solver(BENCH_CONFIG, kernels="full"), problem_bits
        ),
    }
    outs = {}
    for name, (solver, prob) in runs.items():
        t0 = time.perf_counter()
        outs[name] = solver(prob)
        device_sync(outs[name][2].loss)
        print(f"{name}: compile {time.perf_counter() - t0:.1f}s", flush=True)

    times = {name: [] for name in runs}
    for rep in range(reps):
        for name, (solver, prob) in runs.items():
            t0 = time.perf_counter()
            out = solver(prob)
            device_sync(out[2].loss)
            times[name].append(time.perf_counter() - t0)
    for name in runs:
        ts = sorted(times[name])
        cams, pts, state = outs[name]
        rmse = float(jax.device_get(reprojection_rmse(flat_host, cams, pts)))
        print(
            f"{name}: best {ts[0]:.4f}s median {ts[len(ts) // 2]:.4f}s "
            f"(all {['%.3f' % t for t in ts]}), rmse {rmse:.3e} px, "
            f"accepted {int(jax.device_get(state.accepted))}",
            flush=True,
        )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5)
