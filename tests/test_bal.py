"""BAL-format round-trip and solve tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu3drecon.dataset.synthetic import make_scene, perturb_scene, scene_to_ba_problem
from tpu3drecon.geometry.rotations import matrix_to_rodrigues_batch
from tpu3drecon.io.bal import ba_problem_from_bal, read_bal, write_bal
from tpu3drecon.solvers.bundle_adjust import BAConfig, ba_solve, reprojection_rmse


@pytest.fixture(scope="module")
def bal_file(tmp_path_factory):
    # Build a BAL file from a synthetic scene: convert our +z pinhole
    # extrinsics into BAL's -z convention (inverse of the reader's flip).
    scene = make_scene(n_cameras=6, n_points=150, seed=131)
    noisy = perturb_scene(scene, seed=132, point2d_noise=0.0)
    flip = np.diag([1.0, -1.0, -1.0])
    rmats_bal = np.einsum("ij,cjk->cik", flip, noisy.rmats)
    tvecs_bal = noisy.tvecs @ flip.T
    rvecs = np.asarray(matrix_to_rodrigues_batch(jnp.asarray(rmats_bal)))
    f = noisy.fx_fy[:, 0]
    cam_params = np.concatenate(
        [rvecs, tvecs_bal, f[:, None], np.zeros((len(f), 2))], axis=1
    )
    # Observations: centered pixels from the CLEAN scene with the noisy cams'
    # principal points removed (BAL has pp at origin): use uv - (cx, cy),
    # with fy forced == fx for BAL's single-focal model.
    uv_centered = scene.uv - noisy.cx_cy_skew[scene.cam_idx][:, :2]
    path = tmp_path_factory.mktemp("bal") / "problem.txt"
    write_bal(str(path), scene.cam_idx, scene.pt_idx, uv_centered, cam_params, noisy.points3d)
    return str(path)


def test_read_round_trip(bal_file):
    cam_idx, pt_idx, uv, cam_params, points = read_bal(bal_file)
    assert cam_params.shape == (6, 9)
    assert points.shape == (150, 3)
    assert len(cam_idx) == len(pt_idx) == len(uv)


def test_problem_packs_and_solves(bal_file):
    problem, meta = ba_problem_from_bal(bal_file, dtype=jnp.float64)
    assert problem.n_cameras == 6
    assert meta.distortion.shape == (6, 2)
    config = BAConfig(maxiter=40, gtol=1e-12, cg_rtol=1e-8, optimize_focal=False)
    cams, pts, state = ba_solve(problem, config)
    rmse0 = float(reprojection_rmse(problem, problem.cameras, problem.points3d))
    rmse1 = float(reprojection_rmse(problem, cams, pts))
    assert rmse1 < 0.05 * rmse0


def test_corrupt_bal_clear_error(tmp_path):
    bad = tmp_path / "bad.txt"
    bad.write_text("3 2 1\n0 0 1.0")
    with pytest.raises(ValueError, match="corrupt BAL file.*promises 3 cams"):
        read_bal(str(bad))
    empty = tmp_path / "empty.txt"
    empty.write_text("")
    with pytest.raises(ValueError, match="missing header"):
        read_bal(str(empty))
