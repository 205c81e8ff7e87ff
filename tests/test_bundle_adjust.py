"""Bundle-adjustment solver tests: GT recovery up to gauge, scaling sanity.

The key correctness bar (BASELINE.md): recover reference poses/points with
reprojection RMSE driven to ~0 on noiseless observations, from perturbed
initializations, at scales far beyond the reference's 15-camera/400-point
dense-J ceiling.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu3drecon.dataset.synthetic import (
    make_scene,
    perturb_scene,
    scene_to_ba_problem,
)
from tpu3drecon.geometry.alignment import umeyama_alignment
from tpu3drecon.geometry.losses import RobustLoss
from tpu3drecon.solvers.bundle_adjust import (
    BAConfig,
    ba_solve,
    make_ba_solver,
    reprojection_rmse,
)


@pytest.fixture(scope="module")
def scene():
    return make_scene(n_cameras=8, n_points=300, seed=7)


@pytest.fixture(scope="module")
def noisy(scene):
    return perturb_scene(
        scene,
        point3d_noise=3e-2,
        camera_rotation_noise=2e-2,
        camera_translation_noise=5e-2,
        camera_intrinsics_noise=10.0,
        point2d_noise=0.0,  # noiseless obs -> exact optimum at GT (mod gauge)
        seed=8,
    )


@pytest.fixture(scope="module")
def solved(scene, noisy):
    problem, _ = scene_to_ba_problem(noisy, observed=scene, dtype=jnp.float64)
    config = BAConfig(maxiter=60, gtol=1e-12, ftol=1e-15, cg_maxiter=200, cg_rtol=1e-8)
    cams, pts, state = ba_solve(problem, config)
    return problem, cams, pts, state


class TestConvergence:
    def test_rmse_driven_to_zero(self, solved):
        problem, cams, pts, state = solved
        rmse0 = float(reprojection_rmse(problem, problem.cameras, problem.points3d))
        rmse1 = float(reprojection_rmse(problem, cams, pts))
        assert rmse0 > 1.0  # initial perturbation visible in pixels
        assert rmse1 < 1e-5  # converged to the noiseless optimum

    def test_loss_monotone_and_accepted_steps(self, solved):
        _, _, _, state = solved
        assert int(state.accepted) > 0
        assert float(state.loss) < 1e-10

    def test_points_match_gt_up_to_gauge(self, scene, solved):
        problem, cams, pts, state = solved
        sim = umeyama_alignment(pts, jnp.asarray(scene.points3d))
        aligned = np.array(sim.apply(pts))
        err = np.linalg.norm(aligned - scene.points3d, axis=1)
        assert np.median(err) < 1e-6

    def test_camera_centers_match_gt_up_to_gauge(self, scene, solved):
        problem, cams, pts, state = solved
        centers = np.array(
            jnp.einsum("cji,cj->ci", cams.rmats, -cams.tvecs)
        )  # -R^T t
        gt_centers = np.einsum("cji,cj->ci", scene.rmats, -scene.tvecs)
        sim = umeyama_alignment(pts, jnp.asarray(scene.points3d))
        aligned = np.array(sim.apply(jnp.asarray(centers)))
        err = np.linalg.norm(aligned - gt_centers, axis=1)
        assert np.max(err) < 1e-5


class TestConfigurations:
    def test_pose_only_ba(self, scene, noisy):
        # Freeze points: motion-only BA must still reduce error.
        noisy_cams_only = perturb_scene(
            scene, point3d_noise=0.0, camera_rotation_noise=2e-2,
            camera_translation_noise=5e-2, camera_intrinsics_noise=0.0,
            point2d_noise=0.0, seed=9,
        )
        problem, _ = scene_to_ba_problem(noisy_cams_only, observed=scene, dtype=jnp.float64)
        config = BAConfig(maxiter=40, gtol=1e-12, optimize_points=False, cg_rtol=1e-8)
        cams, pts, state = ba_solve(problem, config)
        np.testing.assert_allclose(np.array(pts), np.array(problem.points3d))
        assert float(reprojection_rmse(problem, cams, pts)) < 1e-5

    def test_fixed_focal(self, scene, noisy):
        problem, _ = scene_to_ba_problem(noisy, observed=scene, dtype=jnp.float64)
        config = BAConfig(maxiter=40, gtol=1e-12, optimize_focal=False, cg_rtol=1e-8)
        cams, pts, state = ba_solve(problem, config)
        np.testing.assert_allclose(
            np.array(cams.fx_fy), np.array(problem.cameras.fx_fy)
        )

    def test_robust_loss_with_outliers(self, scene):
        # Corrupt 5% of observations; Cauchy BA should still land near GT.
        rng = np.random.default_rng(11)
        noisy = perturb_scene(scene, point2d_noise=0.0, seed=12)
        import dataclasses

        problem, _ = scene_to_ba_problem(noisy, observed=scene, dtype=jnp.float64)
        uv = np.array(problem.uv)
        n_real = int(np.array(problem.mask).sum())
        bad = rng.choice(n_real, size=n_real // 20, replace=False)
        uv[bad] += rng.normal(scale=100.0, size=(len(bad), 2))
        problem = dataclasses.replace(problem, uv=jnp.asarray(uv))

        config = BAConfig(maxiter=60, gtol=1e-12, loss=RobustLoss.CAUCHY, cg_rtol=1e-8)
        cams, pts, state = ba_solve(problem, config)
        sim = umeyama_alignment(pts, jnp.asarray(scene.points3d))
        err = np.linalg.norm(np.array(sim.apply(pts)) - scene.points3d, axis=1)
        assert np.median(err) < 1e-3

    def test_float32(self, scene, noisy):
        problem, _ = scene_to_ba_problem(noisy, observed=scene, dtype=jnp.float32)
        config = BAConfig(maxiter=50, gtol=1e-6, cg_rtol=1e-4)
        solver = make_ba_solver(config)
        cams, pts, state = solver(problem)
        rmse = float(reprojection_rmse(problem, cams, pts))
        assert rmse < 0.05  # f32 floor: well below a twentieth of a pixel


class TestScaling:
    def test_beyond_reference_ceiling(self):
        # 30 cams / 2000 points — 5x the reference's dense-J ceiling — must
        # converge in seconds even on the CPU test mesh.
        scene = make_scene(n_cameras=30, n_points=2000, obs_per_camera=400, seed=13)
        noisy = perturb_scene(scene, seed=14, point2d_noise=0.0)
        problem, _ = scene_to_ba_problem(noisy, observed=scene, dtype=jnp.float64)
        config = BAConfig(maxiter=40, gtol=1e-10, cg_rtol=1e-6)
        cams, pts, state = ba_solve(problem, config)
        assert float(reprojection_rmse(problem, cams, pts)) < 1e-3
