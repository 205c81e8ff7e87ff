"""Sharded track-table BA vs the single-device tt engine (virtual CPU mesh)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu3drecon.dataset.synthetic import make_scene, perturb_scene, scene_to_ba_problem
from tpu3drecon.parallel.mesh import make_mesh
from tpu3drecon.parallel.sharded_tt import ba_solve_tt_sharded, shard_tt_problem
from tpu3drecon.problems.tt import tt_from_flat
from tpu3drecon.solvers.ba_tt import ba_solve_tt
from tpu3drecon.solvers.bundle_adjust import BAConfig, reprojection_rmse


@pytest.fixture(scope="module", params=[(0.0, 0.0), (-0.08, 0.012)], ids=["pinhole", "radial"])
def problem_pair(request):
    scene = make_scene(n_cameras=8, n_points=400, seed=31, dist=request.param)
    noisy = perturb_scene(scene, seed=32, point2d_noise=0.0)
    flat, _ = scene_to_ba_problem(noisy, observed=scene, dtype=jnp.float64)
    tt = tt_from_flat(flat, point_block=64)
    return flat, tt


CONFIG = BAConfig(maxiter=12, gtol=1e-14, cg_maxiter=40, cg_rtol=1e-10)
# Trajectory-equality config: ONE step, before the zero-residual convergence
# plateau.  The second step already lands at loss ~1e-8 where solutions are
# free to drift along BA's 7-dim gauge orbit (measured ~1e-5), so tight
# point-wise equality is only meaningful on the first step.
TRAJ_CONFIG = CONFIG._replace(maxiter=1)


class TestShardedTT:
    @pytest.mark.parametrize("n_devices", [2, 8])
    def test_matches_single_device(self, problem_pair, n_devices):
        flat, tt = problem_pair
        mesh = make_mesh(n_devices)
        # Early-trajectory step equivalence (tight).
        cams_s, pts_s, st_s = ba_solve_tt_sharded(tt, TRAJ_CONFIG, mesh=mesh)
        cams_1, pts_1, st_1 = ba_solve_tt(tt, TRAJ_CONFIG)
        assert int(st_s.accepted) == int(st_1.accepted)
        np.testing.assert_allclose(np.asarray(pts_s), np.asarray(pts_1), rtol=0, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(cams_s.tvecs), np.asarray(cams_1.tvecs), rtol=0, atol=1e-6
        )
        # Full convergence: both reach the noiseless optimum.
        cams_f, pts_f, st_f = ba_solve_tt_sharded(tt, CONFIG, mesh=mesh)
        rmse = float(reprojection_rmse(flat, cams_f, pts_f))
        assert rmse < 1e-8

    def test_joint_distortion_sharded(self, problem_pair):
        # The 10-param joint camera blocks stay step-equivalent under the
        # mesh (the psum sites cover the widened np_cam reductions).
        flat, tt = problem_pair
        mesh = make_mesh(4)
        config = TRAJ_CONFIG._replace(optimize_dist=True)
        cams_s, pts_s, st_s = ba_solve_tt_sharded(tt, config, mesh=mesh)
        cams_1, pts_1, st_1 = ba_solve_tt(tt, config)
        assert int(st_s.accepted) == int(st_1.accepted)
        np.testing.assert_allclose(
            np.asarray(cams_s.dist), np.asarray(cams_1.dist), rtol=0, atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(pts_s), np.asarray(pts_1), rtol=0, atol=1e-6)

    def test_single_device_mesh_bit_exact(self, problem_pair):
        # On a 1-device mesh psum is the identity, so the SPMD code path must
        # reproduce the single-chip engine BIT-EXACTLY — the strongest
        # correctness anchor (multi-device runs only add psum-order noise).
        _, tt = problem_pair
        config = CONFIG._replace(maxiter=3, optimize_dist=True)
        cams_s, pts_s, st_s = ba_solve_tt_sharded(tt, config, mesh=make_mesh(1))
        cams_1, pts_1, st_1 = ba_solve_tt(tt, config)
        assert np.array_equal(np.asarray(pts_s), np.asarray(pts_1))
        assert np.array_equal(np.asarray(cams_s.tvecs), np.asarray(cams_1.tvecs))
        assert np.array_equal(np.asarray(cams_s.dist), np.asarray(cams_1.dist))
        assert float(st_s.loss) == float(st_1.loss)

    def test_divisibility_guard(self, problem_pair):
        _, tt = problem_pair
        mesh = make_mesh(8)
        bad = tt  # point_block=64 buckets are divisible by 8; fake a bad mesh
        with pytest.raises(ValueError, match="not divisible"):
            shard_tt_problem(bad, make_mesh(3), "obs")

    def test_onehot_shards_shrink(self, problem_pair):
        # The O(C*slots) one-hot must actually divide across the mesh: each
        # device's addressable shard is 1/D of the global bytes.
        _, tt = problem_pair
        mesh = make_mesh(8)
        buckets, pts, cams, avg_w = shard_tt_problem(tt, mesh, mesh.axis_names[0])
        for b_placed, b in zip(buckets, tt.buckets):
            assert b_placed.onehot.ndim == 3  # (C, Tb, Pb) sharded form
            shard_shape = b_placed.onehot.sharding.shard_shape(b_placed.onehot.shape)
            assert shard_shape[-1] * 8 == b.mask.shape[1]
