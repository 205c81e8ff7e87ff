"""Single-pose refinement tests: recover ground-truth poses from noisy inits.

Covers what the reference never tested directly: that the PnP LM actually
drives perturbed poses back to the optimum (its only check was a NaN guard,
src/benchmark/jaxopt_benchmark/helpers.py:24-27).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu3drecon.dataset.synthetic import (
    make_scene,
    perturb_scene,
    scene_to_pose_problem,
)
from tpu3drecon.geometry.pose import rotation_geodesic_angle
from tpu3drecon.solvers.lm_core import LMConfig
from tpu3drecon.solvers.pose_refine import (
    PoseRefiner,
    pose_params_pack,
    pose_params_unpack,
    refine_poses,
)
from tpu3drecon.geometry.losses import RobustLoss


@pytest.fixture(scope="module")
def scene():
    return make_scene(n_cameras=6, n_points=200, seed=3)


@pytest.fixture(scope="module")
def noisy(scene):
    return perturb_scene(
        scene,
        point3d_noise=0.0,  # PnP: 3D points stay fixed at ground truth
        camera_rotation_noise=2e-2,
        camera_translation_noise=5e-2,
        camera_intrinsics_noise=10.0,
        point2d_noise=0.0,
        seed=4,
    )


def reproj_rmse(problem, cameras):
    from tpu3drecon.geometry.projection import project_points_batched

    proj = project_points_batched(
        cameras.rmats, cameras.tvecs, cameras.fx_fy, cameras.cx_cy_skew,
        cameras.dist, problem.points3d,
    )
    err = np.array((proj - problem.points2d) * problem.mask[..., None])
    n = float(np.array(problem.mask).sum())
    return np.sqrt((err**2).sum() / (2 * n))


class TestPoseParamsPacking:
    def test_pack_unpack_round_trip(self, scene, noisy):
        problem, _ = scene_to_pose_problem(noisy, observed=scene, dtype=jnp.float64)
        params = pose_params_pack(problem.cameras)
        cams = pose_params_unpack(params, problem.cameras.cx_cy_skew, problem.cameras.dist)
        np.testing.assert_allclose(
            np.array(cams.rmats), np.array(problem.cameras.rmats), atol=1e-9
        )
        np.testing.assert_allclose(
            np.array(cams.tvecs), np.array(problem.cameras.tvecs), atol=1e-12
        )


def test_recovers_ground_truth(scene, noisy):
    problem, _ = scene_to_pose_problem(noisy, observed=scene, dtype=jnp.float64)
    cams, state = refine_poses(
        problem,
        loss=RobustLoss.CAUCHY,
        config=LMConfig(maxiter=100, gtol=1e-12, ftol=1e-16),
        residual_form="per_axis",
    )
    for c in range(scene.n_cameras):
        ang = float(
            rotation_geodesic_angle(
                cams.rmats[c], jnp.asarray(scene.rmats[c])
            )
        )
        assert ang < 1e-4, f"camera {c} rotation error {ang}"
    np.testing.assert_allclose(np.array(cams.tvecs), scene.tvecs, atol=2e-3)
    np.testing.assert_allclose(np.array(cams.fx_fy), scene.fx_fy, rtol=1e-2)


def test_scalar_parity_form_reduces_error(scene, noisy):
    # The reference-parity scalar form minimizes cauchy(e^2) squared — a
    # saturating 4th-power objective that is NOT expected to pin down GT
    # tightly (the reference only ever evaluated reprojection-error
    # improvement, benchmark_visualization.py:13-56). Assert a strong error
    # reduction instead.
    problem, _ = scene_to_pose_problem(noisy, observed=scene, dtype=jnp.float64)
    rmse0 = reproj_rmse(problem, problem.cameras)
    cams, _ = refine_poses(
        problem,
        loss=RobustLoss.CAUCHY,
        config=LMConfig(maxiter=100, gtol=1e-14, ftol=1e-16),
        residual_form="scalar",
    )
    rmse1 = reproj_rmse(problem, cams)
    assert rmse1 < 0.05 * rmse0


def test_rmse_improves_and_near_zero(scene, noisy):
    problem, _ = scene_to_pose_problem(noisy, observed=scene, dtype=jnp.float64)
    rmse0 = reproj_rmse(problem, problem.cameras)
    cams, _ = refine_poses(
        problem, config=LMConfig(maxiter=100, gtol=1e-12, ftol=1e-16)
    )
    rmse1 = reproj_rmse(problem, cams)
    assert rmse0 > 1.0  # the perturbation was visible
    assert rmse1 < 1e-3  # noiseless observations: near-exact recovery


def test_float32_path(scene, noisy):
    problem, _ = scene_to_pose_problem(noisy, observed=scene, dtype=jnp.float32)
    cams, state = refine_poses(
        problem, config=LMConfig(maxiter=100, gtol=1e-6)
    )
    rmse1 = reproj_rmse(problem, cams)
    assert rmse1 < 0.1  # f32: sub-pixel


def test_masked_padding_does_not_bias(scene, noisy):
    # Solve, then re-solve with extra padding — results must match.
    p64, _ = scene_to_pose_problem(noisy, observed=scene, dtype=jnp.float64, pad_multiple=256)
    p_big, _ = scene_to_pose_problem(noisy, observed=scene, dtype=jnp.float64, pad_multiple=512)
    cams_a, _ = refine_poses(p64, config=LMConfig(maxiter=60, gtol=1e-12))
    cams_b, _ = refine_poses(p_big, config=LMConfig(maxiter=60, gtol=1e-12))
    np.testing.assert_allclose(
        np.array(cams_a.tvecs), np.array(cams_b.tvecs), atol=1e-8
    )


def test_refiner_compile_api():
    # The reference's compile() warm-up contract (pose_optimization.py:91-99).
    refiner = PoseRefiner(avg_cam_width=1000.0)
    refiner.compile(points_num=64, batch_size=2)
