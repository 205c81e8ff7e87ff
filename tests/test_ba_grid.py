"""Grid-layout BA engine vs the flat-layout engine: blocks and full solves."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu3drecon.dataset.synthetic import make_scene, perturb_scene, scene_to_ba_problem
from tpu3drecon.geometry.losses import RobustLoss
from tpu3drecon.ops.jacobians import gather_obs_blocks
from tpu3drecon.problems.grid import grid_from_flat
from tpu3drecon.solvers.ba_grid import ba_solve_grid, grid_blocks
from tpu3drecon.solvers.bundle_adjust import BAConfig, ba_solve, reprojection_rmse


@pytest.fixture(scope="module", params=[(0.0, 0.0), (-0.08, 0.012)], ids=["pinhole", "radial"])
def flat_problem(request):
    scene = make_scene(n_cameras=8, n_points=300, seed=7, dist=request.param)
    noisy = perturb_scene(scene, seed=8, point2d_noise=0.0)
    problem, _ = scene_to_ba_problem(noisy, observed=scene, dtype=jnp.float64)
    return problem


@pytest.fixture(scope="module")
def grid_problem(flat_problem):
    return grid_from_flat(flat_problem)


class TestGridPacking:
    def test_counts_preserved(self, flat_problem, grid_problem):
        n_real = int(np.array(flat_problem.mask).sum())
        assert int(np.array(grid_problem.mask).sum()) == n_real
        assert int(np.array(grid_problem.track_mask).sum()) == n_real

    def test_track_table_points_back(self, flat_problem, grid_problem):
        # Every track entry's flat cell must reference an obs of that point.
        gpt = np.array(grid_problem.pt_idx).reshape(-1)
        tidx = np.array(grid_problem.track_idx)
        tmask = np.array(grid_problem.track_mask)
        P, T = tidx.shape
        for p in range(0, P, 37):
            for t in range(T):
                if tmask[p, t] > 0:
                    assert gpt[tidx[p, t]] == p


@pytest.mark.parametrize("loss", [RobustLoss.TRIVIAL, RobustLoss.CAUCHY, RobustLoss.HUBER])
class TestGridBlocks:
    def test_matches_flat_blocks(self, flat_problem, grid_problem, loss):
        cams = flat_problem.cameras
        inv_w = 1.0 / flat_problem.avg_cam_width
        flat = gather_obs_blocks(
            cams.rmats, cams.tvecs, cams.fx_fy, cams.cx_cy_skew, cams.dist,
            flat_problem.points3d, flat_problem.cam_idx, flat_problem.pt_idx,
            flat_problem.uv, flat_problem.mask, inv_w, loss,
        )
        grid = grid_blocks(
            cams.rmats, cams.tvecs, cams.fx_fy, cams.cx_cy_skew, cams.dist,
            grid_problem.points3d, grid_problem, loss,
        )
        # Compare per-(cam, uv) — the grid reorders obs within each camera.
        C, K = grid_problem.uv.shape[:2]
        guv = np.array(grid_problem.uv).reshape(C * K, 2)
        gmask = np.array(grid_problem.mask).reshape(-1)
        gr = np.array(grid.r).reshape(C * K, 2)
        gjc = np.array(grid.jc).reshape(C * K, 2, 8)
        gjp = np.array(grid.jp).reshape(C * K, 2, 3)
        lut = {}
        gcam = np.repeat(np.arange(C), K)
        for i in np.nonzero(gmask)[0]:
            lut[(int(gcam[i]), round(float(guv[i, 0]), 9), round(float(guv[i, 1]), 9))] = i
        fmask = np.array(flat_problem.mask) > 0
        fuv = np.array(flat_problem.uv)
        fcam = np.array(flat_problem.cam_idx)
        checked = 0
        for k in np.nonzero(fmask)[0][::7]:
            gi = lut[(int(fcam[k]), round(float(fuv[k, 0]), 9), round(float(fuv[k, 1]), 9))]
            np.testing.assert_allclose(gr[gi], np.array(flat.residual[k]), atol=1e-12)
            np.testing.assert_allclose(gjc[gi], np.array(flat.j_cam[k]), atol=1e-12)
            np.testing.assert_allclose(gjp[gi], np.array(flat.j_pt[k]), atol=1e-12)
            checked += 1
        assert checked > 50


class TestGridSolve:
    def test_matches_flat_solve(self, flat_problem, grid_problem):
        config = BAConfig(maxiter=30, gtol=1e-12, cg_maxiter=100, cg_rtol=1e-8)
        cams_f, pts_f, state_f = ba_solve(flat_problem, config)
        cams_g, pts_g, state_g = ba_solve_grid(grid_problem, config)
        assert int(state_g.accepted) == int(state_f.accepted)
        np.testing.assert_allclose(np.array(pts_g), np.array(pts_f), atol=1e-7)
        np.testing.assert_allclose(
            np.array(cams_g.tvecs), np.array(cams_f.tvecs), atol=1e-7
        )
        np.testing.assert_allclose(
            float(state_g.loss), float(state_f.loss), rtol=1e-6, atol=1e-18
        )

    def test_converges_to_zero_rmse(self, flat_problem, grid_problem):
        config = BAConfig(maxiter=50, gtol=1e-12, ftol=1e-15, cg_maxiter=200, cg_rtol=1e-8)
        cams_g, pts_g, _ = ba_solve_grid(grid_problem, config)
        rmse = float(reprojection_rmse(flat_problem, cams_g, pts_g))
        assert rmse < 1e-5

    def test_f32(self):
        scene = make_scene(n_cameras=8, n_points=300, seed=7)
        noisy = perturb_scene(scene, seed=8, point2d_noise=0.0)
        problem, _ = scene_to_ba_problem(noisy, observed=scene, dtype=jnp.float32)
        grid = grid_from_flat(problem)
        config = BAConfig(maxiter=50, gtol=1e-6, cg_rtol=1e-4)
        cams, pts, state = ba_solve_grid(grid, config)
        rmse = float(reprojection_rmse(problem, cams, pts))
        assert rmse < 0.05
