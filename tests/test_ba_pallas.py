"""Pallas-path BA solve vs the XLA grid engine (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu3drecon.dataset.synthetic import make_scene, perturb_scene, scene_to_ba_problem
from tpu3drecon.geometry.losses import RobustLoss
from tpu3drecon.problems.grid import grid_from_flat
from tpu3drecon.solvers.ba_grid import ba_solve_grid
from tpu3drecon.solvers.ba_pallas import ba_solve_pallas
from tpu3drecon.solvers.bundle_adjust import BAConfig, reprojection_rmse


@pytest.fixture(scope="module")
def problems():
    scene = make_scene(n_cameras=6, n_points=200, seed=71)
    noisy = perturb_scene(scene, seed=72, point2d_noise=0.0)
    flat, _ = scene_to_ba_problem(noisy, observed=scene, dtype=jnp.float32)
    return flat, grid_from_flat(flat)


def test_pallas_solve_matches_grid_engine(problems):
    # Same controller + same math, but f32 reduction order differs between
    # the kernel and XLA paths, so accept decisions can diverge mid-solve;
    # compare the *optima* both engines reach at tight convergence.
    flat, grid = problems
    config = BAConfig(maxiter=40, gtol=1e-10, ftol=1e-12, cg_maxiter=100, cg_rtol=1e-6)
    cams_g, pts_g, state_g = ba_solve_grid(grid, config)
    cams_p, pts_p, state_p = ba_solve_pallas(grid, config, interpret=True)
    rmse_g = float(reprojection_rmse(flat, cams_g, pts_g))
    rmse_p = float(reprojection_rmse(flat, cams_p, pts_p))
    assert rmse_p < max(2.0 * rmse_g, 0.02)
    np.testing.assert_allclose(np.array(pts_p), np.array(pts_g), atol=5e-3)
    np.testing.assert_allclose(
        np.array(cams_p.tvecs), np.array(cams_g.tvecs), atol=5e-3
    )


def test_pallas_solve_converges(problems):
    flat, grid = problems
    config = BAConfig(maxiter=40, gtol=1e-8, cg_maxiter=100, cg_rtol=1e-6)
    cams, pts, state = ba_solve_pallas(grid, config, interpret=True)
    rmse = float(reprojection_rmse(flat, cams, pts))
    assert rmse < 0.05
    assert int(state.accepted) > 0


def test_pallas_cauchy_loss(problems):
    # Divergent accept paths land in different gauges; compare the point
    # clouds after similarity alignment.
    from tpu3drecon.geometry.alignment import umeyama_alignment

    flat, grid = problems
    config = BAConfig(
        maxiter=25, gtol=1e-10, cg_rtol=1e-6, loss=RobustLoss.CAUCHY
    )
    cams_p, pts_p, state_p = ba_solve_pallas(grid, config, interpret=True)
    cams_g, pts_g, state_g = ba_solve_grid(grid, config)
    sim = umeyama_alignment(pts_p, pts_g)
    err = np.linalg.norm(np.array(sim.apply(pts_p)) - np.array(pts_g), axis=1)
    assert np.median(err) < 1e-2
    assert int(state_p.accepted) > 0


def test_bucketed_tracks_match_plain(problems):
    from tpu3drecon.problems.grid import grid_bucketed_from_flat

    flat, grid = problems
    bucketed = grid_bucketed_from_flat(flat, point_block=64)
    # Bucket A should hold most points at a tight T.
    assert bucketed.buckets[0].track_idx.shape[1] <= grid.track_idx.shape[1]
    config = BAConfig(maxiter=25, gtol=1e-10, cg_maxiter=60, cg_rtol=1e-6)
    cams_b, pts_b, state_b = ba_solve_pallas(bucketed, config, interpret=True)
    cams_p, pts_p, state_p = ba_solve_pallas(grid, config, interpret=True)
    assert pts_b.shape == pts_p.shape  # un-permuted back to original order
    rmse_b = float(reprojection_rmse(flat, cams_b, pts_b))
    rmse_p = float(reprojection_rmse(flat, cams_p, pts_p))
    assert rmse_b < max(2.0 * rmse_p, 0.02)
    np.testing.assert_allclose(np.array(pts_b), np.array(pts_p), atol=5e-3)
