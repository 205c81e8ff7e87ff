"""BAL-format loader tests against an independent oracle.

The fixture generates observations by evaluating BAL's OWN camera model
(Agarwal et al.: P = R X + t, p = -P/P.z, pixel = f * r(p) * p — the exact
formula in Ceres' snavely_reprojection_error.h), with no code shared with the
loader.  This pins the loader's convention handling (the diag(1,-1,-1)
conjugation + v negation) to the published model rather than to a
self-consistent round trip.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from tpu3drecon.io.bal import ba_problem_from_bal, read_bal, write_bal
from tpu3drecon.solvers.bundle_adjust import BAConfig, ba_solve, reprojection_rmse


def _rodrigues(rvec: np.ndarray) -> np.ndarray:
    """Axis-angle -> rotation matrix (plain numpy, independent of tpu3drecon)."""
    theta = np.linalg.norm(rvec)
    if theta < 1e-12:
        return np.eye(3)
    k = rvec / theta
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def _bal_project(rvec, tvec, f, k1, k2, pts):
    """BAL's published projection model, straight from the problem definition."""
    P = pts @ _rodrigues(rvec).T + tvec
    p = -P[:, :2] / P[:, 2:3]
    r2 = np.sum(p * p, axis=1, keepdims=True)
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    return f * radial * p


def _make_bal_scene(seed=77, n_cams=6, n_pts=150, k1k2=(0.0, 0.0)):
    rng = np.random.default_rng(seed)
    # BAL cameras look down -z: points in front have z_cam < 0.
    points = rng.normal(size=(n_pts, 3)) * np.array([2.0, 2.0, 0.8]) + np.array(
        [0.0, 0.0, -6.0]
    )
    rvecs = rng.normal(size=(n_cams, 3)) * 0.05
    tvecs = rng.normal(size=(n_cams, 3)) * 0.2
    f = 500.0 + rng.uniform(size=n_cams) * 100.0
    k1 = np.full(n_cams, k1k2[0])
    k2 = np.full(n_cams, k1k2[1])
    cam_idx = np.repeat(np.arange(n_cams), n_pts).astype(np.int32)
    pt_idx = np.tile(np.arange(n_pts), n_cams).astype(np.int32)
    uv = np.concatenate(
        [
            _bal_project(rvecs[c], tvecs[c], f[c], k1[c], k2[c], points)
            for c in range(n_cams)
        ]
    )
    cam_params = np.concatenate(
        [rvecs, tvecs, f[:, None], k1[:, None], k2[:, None]], axis=1
    )
    return cam_idx, pt_idx, uv, cam_params, points


@pytest.fixture(scope="module")
def bal_file(tmp_path_factory):
    cam_idx, pt_idx, uv, cam_params, points = _make_bal_scene()
    path = tmp_path_factory.mktemp("bal") / "problem.txt"
    write_bal(str(path), cam_idx, pt_idx, uv, cam_params, points)
    return str(path)


def test_read_round_trip(bal_file):
    cam_idx, pt_idx, uv, cam_params, points = read_bal(bal_file)
    assert cam_params.shape == (6, 9)
    assert points.shape == (150, 3)
    assert len(cam_idx) == len(pt_idx) == len(uv)


def test_loader_matches_bal_model(bal_file):
    """At ground truth, our residuals on the loaded problem must be ~0.

    The observations were produced by BAL's own formula; if the loader's
    convention transform (extrinsic conjugation, v flip) is wrong on any axis
    this is off by hundreds of pixels, not epsilon.
    """
    problem, meta = ba_problem_from_bal(bal_file, dtype=jnp.float64)
    rmse = float(reprojection_rmse(problem, problem.cameras, problem.points3d))
    assert rmse < 1e-9, f"loader disagrees with the BAL camera model: rmse={rmse}"


def test_problem_packs_and_solves(bal_file):
    problem, meta = ba_problem_from_bal(bal_file, dtype=jnp.float64)
    assert problem.n_cameras == 6
    # Perturb geometry, then solve back to the observations.
    rng = np.random.default_rng(5)
    pts0 = jnp.asarray(
        np.asarray(problem.points3d) + rng.normal(size=problem.points3d.shape) * 0.01
    )
    problem_noisy = dataclasses.replace(problem, points3d=pts0)
    config = BAConfig(maxiter=40, gtol=1e-12, cg_rtol=1e-8, optimize_focal=False)
    cams, pts, state = ba_solve(problem_noisy, config)
    rmse0 = float(reprojection_rmse(problem_noisy, problem_noisy.cameras, pts0))
    rmse1 = float(reprojection_rmse(problem_noisy, cams, pts))
    assert rmse1 < 0.05 * rmse0


def test_distorted_bal_loader_and_solve(tmp_path):
    """Nonzero (k1, k2): loader must hit ~0 residual at GT and the solver must
    recover perturbed geometry against the distorted observations."""
    cam_idx, pt_idx, uv, cam_params, points = _make_bal_scene(
        seed=88, k1k2=(-0.12, 0.02)
    )
    path = tmp_path / "distorted.txt"
    write_bal(str(path), cam_idx, pt_idx, uv, cam_params, points)
    problem, meta = ba_problem_from_bal(str(path), dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(problem.cameras.dist[0]), [-0.12, 0.02])
    rmse_gt = float(reprojection_rmse(problem, problem.cameras, problem.points3d))
    assert rmse_gt < 1e-9, f"distorted model mismatch at GT: rmse={rmse_gt}"

    rng = np.random.default_rng(9)
    pts0 = jnp.asarray(
        np.asarray(problem.points3d) + rng.normal(size=problem.points3d.shape) * 0.01
    )
    problem_noisy = dataclasses.replace(problem, points3d=pts0)
    config = BAConfig(maxiter=40, gtol=1e-12, cg_rtol=1e-8, optimize_focal=False)
    cams, pts, state = ba_solve(problem_noisy, config)
    rmse0 = float(reprojection_rmse(problem_noisy, problem_noisy.cameras, pts0))
    rmse1 = float(reprojection_rmse(problem_noisy, cams, pts))
    assert rmse1 < 0.02 * rmse0
    # The recovered points must match the true (distortion-generating)
    # points up to the BA gauge (free poses drift along the 7-dof similarity
    # null space; the amount depends on the CG path/preconditioner).
    from tpu3drecon.geometry.alignment import umeyama_alignment

    sim = umeyama_alignment(np.asarray(pts), points)
    aligned = sim.scale * (np.asarray(pts) @ np.asarray(sim.rotation).T) + np.asarray(
        sim.translation
    )
    np.testing.assert_allclose(aligned, points, atol=2e-4)


def test_corrupt_bal_clear_error(tmp_path):
    bad = tmp_path / "bad.txt"
    bad.write_text("3 2 1\n0 0 1.0")
    with pytest.raises(ValueError, match="corrupt BAL file.*promises 3 cams"):
        read_bal(str(bad))
    empty = tmp_path / "empty.txt"
    empty.write_text("")
    with pytest.raises(ValueError, match="missing header"):
        read_bal(str(empty))


def test_export_bal_round_trip(bal_file, tmp_path):
    """export_bal must invert the loader's convention transforms exactly."""
    from tpu3drecon.io.bal import export_bal

    problem, _ = ba_problem_from_bal(bal_file, dtype=jnp.float64)
    out = tmp_path / "exported.txt"
    export_bal(str(out), problem)
    re_problem, _ = ba_problem_from_bal(str(out), dtype=jnp.float64)
    np.testing.assert_allclose(
        np.asarray(re_problem.points3d), np.asarray(problem.points3d), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(re_problem.cameras.rmats), np.asarray(problem.cameras.rmats),
        atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(re_problem.uv[re_problem.mask > 0]),
        np.asarray(problem.uv[problem.mask > 0]),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(re_problem.cameras.dist), np.asarray(problem.cameras.dist),
        atol=1e-12,
    )


def test_conversions_robust_near_pi(tmp_path):
    """BAL rigs contain rotations near pi (cameras base-rotated about x to
    face -z); the trace/skew rodrigues formula loses the axis there — caught
    as a 14.8px export round-trip error on the Ladybug-like pipeline."""
    from tpu3drecon.io.bal import _matrix_to_rodrigues_np, _rodrigues_to_matrix_np

    rng = np.random.default_rng(11)
    base = np.diag([1.0, -1.0, -1.0])
    mats = []
    for _ in range(20):
        jitter = _rodrigues_to_matrix_np(rng.normal(scale=0.03, size=(1, 3)))[0]
        mats.append(jitter @ base)
    mats = np.stack(mats + [base])  # include exactly pi
    back = _rodrigues_to_matrix_np(_matrix_to_rodrigues_np(mats))
    np.testing.assert_allclose(back, mats, atol=1e-12)
