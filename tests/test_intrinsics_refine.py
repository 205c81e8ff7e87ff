"""Intrinsics + distortion refinement: recover perturbed fx/fy/k1/k2."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from tpu3drecon.dataset.synthetic import make_scene, scene_to_pose_problem
from tpu3drecon.problems.packing import CameraParams
from tpu3drecon.solvers.intrinsics_refine import refine_intrinsics
from tpu3drecon.solvers.lm_core import LMConfig


def _distorted_problem(seed=101, dist=(-0.15, 0.03)):
    scene = make_scene(n_cameras=6, n_points=400, seed=seed, dist=dist)
    problem, _ = scene_to_pose_problem(scene, dtype=jnp.float64)
    return scene, problem


def test_recovers_focal_and_distortion():
    scene, problem = _distorted_problem()
    rng = np.random.default_rng(3)
    # Perturb intrinsics: +-2% focal, distortion zeroed (the common case: the
    # input model carries no distortion estimate at all).
    bad_cams = dataclasses.replace(
        problem.cameras,
        fx_fy=problem.cameras.fx_fy
        * jnp.asarray(1.0 + rng.uniform(-0.02, 0.02, (scene.n_cameras, 2))),
        dist=jnp.zeros_like(problem.cameras.dist),
    )
    bad = dataclasses.replace(problem, cameras=bad_cams)
    cams, state = refine_intrinsics(bad, config=LMConfig(maxiter=80, gtol=1e-14))
    np.testing.assert_allclose(
        np.asarray(cams.fx_fy), scene.fx_fy, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(cams.dist), np.asarray(scene.dist), atol=1e-6
    )
    # Poses untouched.
    np.testing.assert_array_equal(np.asarray(cams.rmats), np.asarray(problem.cameras.rmats))


def test_focal_only_mode_freezes_distortion():
    scene, problem = _distorted_problem(seed=102)
    rng = np.random.default_rng(5)
    bad_cams = dataclasses.replace(
        problem.cameras,
        fx_fy=problem.cameras.fx_fy
        * jnp.asarray(1.0 + rng.uniform(-0.01, 0.01, (scene.n_cameras, 2))),
    )
    bad = dataclasses.replace(problem, cameras=bad_cams)
    cams, state = refine_intrinsics(
        bad, refine_distortion=False, config=LMConfig(maxiter=80, gtol=1e-14)
    )
    # Distortion stayed at the (correct) input values; focal recovered.
    np.testing.assert_array_equal(np.asarray(cams.dist), np.asarray(bad_cams.dist))
    np.testing.assert_allclose(np.asarray(cams.fx_fy), scene.fx_fy, rtol=1e-6)


def test_ba_with_intrinsics_calibration_recovers_distortion():
    """Distorted GT observations + zero-distortion, noisy-geometry init:
    the alternation must recover k1/k2 AND the geometry (neither BA alone
    nor intrinsics refinement alone can)."""
    import dataclasses

    from tpu3drecon.dataset.synthetic import make_scene, perturb_scene, scene_to_ba_problem
    from tpu3drecon.solvers.bundle_adjust import reprojection_rmse
    from tpu3drecon.solvers.intrinsics_refine import ba_with_intrinsics_calibration

    true_dist = (-0.12, 0.02)
    scene = make_scene(n_cameras=6, n_points=300, seed=201, dist=true_dist)
    noisy = perturb_scene(scene, seed=202, point2d_noise=0.0,
                          camera_intrinsics_noise=5.0)
    problem, _ = scene_to_ba_problem(noisy, observed=scene, dtype=jnp.float64)
    # The init claims pinhole (distortion unknown).
    problem = dataclasses.replace(
        problem,
        cameras=dataclasses.replace(
            problem.cameras, dist=jnp.zeros_like(problem.cameras.dist)
        ),
    )
    cams, pts, state = ba_with_intrinsics_calibration(problem, rounds=8)
    # Alternation converges linearly (see docstring): after 8 rounds k1 has
    # covered ~70% of the way from 0 to -0.12 and the rmse is ~20x below a
    # pinhole-only solve.  Exact recovery needs more rounds (measured -0.109
    # at 16); assert decisive movement + quality here to keep the test fast.
    k1 = np.asarray(cams.dist[:, 0])
    assert np.all(k1 < -0.06) and np.all(k1 > -0.14), k1
    rmse = float(reprojection_rmse(problem, cams, pts))
    assert rmse < 0.06
