"""The shared medium-BA benchmark configuration (bench.py + baselines).

BASELINE.json config #3: "Medium BA with intrinsics refinement: ~100 cams /
100k points".  Fixed seeds and fixed iteration counts so the benchmark work
is deterministic across runs and backends.
"""

from __future__ import annotations

import time

import jax

from tpu3drecon.solvers.bundle_adjust import BAConfig

N_CAMERAS = 100
N_POINTS = 100_000
OBS_PER_CAMERA = 2_000
SEED = 42

# Fixed-work config: run exactly LM_ITERS outer iterations (no early stop) so
# wall-clock comparisons measure identical work.  Round-2 tuning (RESULTS.md):
# the SCHUR_JACOBI preconditioner (exact S-diagonal blocks) reaches the
# round-1 final RMSE (1.19e-5 px vs 1.18e-5) with cg_maxiter=8 instead of the
# block-Jacobi-on-U setting's 12; both the CPU baseline and the TPU number
# use the identical config.
LM_ITERS = 30
BENCH_CONFIG = BAConfig(
    maxiter=LM_ITERS,
    gtol=0.0,
    ftol=0.0,
    cg_maxiter=8,
    cg_rtol=1e-4,
    precond="schur_jacobi",
)


def build_problem(dtype=None, on_host: bool = False):
    """Build the medium problem; ``on_host=True`` keeps arrays on the CPU
    device (device<->host transfers through this container's TPU tunnel are
    very slow, so grid repacking must happen host-side)."""
    import jax
    import jax.numpy as jnp

    from tpu3drecon.dataset.synthetic import (
        make_scene,
        perturb_scene,
        scene_to_ba_problem,
    )

    def _build():
        scene = make_scene(
            n_cameras=N_CAMERAS,
            n_points=N_POINTS,
            obs_per_camera=OBS_PER_CAMERA,
            seed=SEED,
        )
        noisy = perturb_scene(scene, seed=SEED + 1, point2d_noise=0.5)
        problem, _ = scene_to_ba_problem(
            noisy, observed=scene, dtype=dtype or jnp.float32
        )
        return problem

    if on_host:
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            return _build()
    return _build()


def build_grid_problem(dtype=None):
    """Medium problem in bucketed grid layout, packed host-side then
    device_put once."""
    import jax

    from tpu3drecon.problems.grid import grid_bucketed_from_flat

    problem = build_problem(dtype, on_host=True)
    grid = grid_bucketed_from_flat(problem)
    return jax.device_put(grid)


def timed_solve_stats(solver, problem, repeats: int = 1):
    """Compile (warm-up) then time; returns (compile_s, run_times, result).

    ``run_times`` is the full per-repetition list so callers can report a
    median and spread — TPU session throughput drifts ~±10% (RESULTS.md), so
    a single draw carries no error bar.

    The compile/run split follows the reference's measurement protocol
    (benchmark_pose_optimization.py:165-182, benchmark_bundle_adjustment.py:
    171-181): warm-up solve counted separately, block_until_ready around the
    timed region.
    """
    def sync(out):
        # block_until_ready is not reliably synchronous through this
        # container's remote-TPU tunnel; fetching a scalar to host is.
        jax.block_until_ready(out)
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])

    t0 = time.perf_counter()
    out = solver(problem)
    sync(out)
    compile_s = time.perf_counter() - t0

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = solver(problem)
        sync(out)
        times.append(time.perf_counter() - t0)
    return compile_s, times, out


def timed_solve(solver, problem, repeats: int = 1):
    """(compile_s, best_run_s, result) — see timed_solve_stats."""
    compile_s, times, out = timed_solve_stats(solver, problem, repeats)
    return compile_s, min(times), out
