"""Problem-packing tests: COLMAP model -> packed problems.

Checks the vectorized packers reproduce the reference's packing semantics
(global point table sorted by id, per-camera padding + masks, track-length
filter of make_reduced_dataset — dataset.py:172-201,
benchmark_bundle_adjustment.py:45-106) against brute-force oracles.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu3drecon.dataset.synthetic import make_scene, scene_to_colmap_model
from tpu3drecon.problems.packing import (
    ba_problem_from_colmap,
    bucket_size,
    pose_problem_from_colmap,
)


@pytest.fixture(scope="module")
def scene():
    return make_scene(n_cameras=6, n_points=120, obs_per_camera=60, seed=21)


@pytest.fixture(scope="module")
def model(scene):
    return scene_to_colmap_model(scene)


class TestBucketing:
    def test_rounds_up(self):
        assert bucket_size(1, 256) == 256
        assert bucket_size(256, 256) == 256
        assert bucket_size(257, 256) == 512
        assert bucket_size(1000, 1024) == 1024


class TestPoseProblem:
    def test_shapes_and_masks(self, model):
        problem, meta = pose_problem_from_colmap(model, dtype=jnp.float64)
        B = len(model.images)
        assert problem.batch == B
        assert problem.points3d.shape == (B, problem.max_points, 3)
        # Mask counts match the per-image 2D-3D association counts.
        for i in range(B):
            _, p3d_ids = model.images.points2d_of(i)
            expected = int((p3d_ids >= 0).sum())
            assert int(np.array(problem.mask[i]).sum()) == expected

    def test_points_match_associations(self, model):
        problem, _ = pose_problem_from_colmap(model, dtype=jnp.float64)
        # Check camera 0's first real observation maps to the right 3D point.
        xy, p3d_ids = model.images.points2d_of(0)
        sel = p3d_ids >= 0
        xy, p3d_ids = xy[sel], p3d_ids[sel]
        np.testing.assert_allclose(np.array(problem.points2d[0, : len(xy)]), xy)
        id_to_xyz = {int(pid): model.points.xyz[r] for r, pid in enumerate(model.points.ids)}
        expected_xyz = np.stack([id_to_xyz[int(p)] for p in p3d_ids])
        np.testing.assert_allclose(np.array(problem.points3d[0, : len(xy)]), expected_xyz)

    def test_camera_limit(self, model):
        problem, meta = pose_problem_from_colmap(model, camera_limit=3)
        assert problem.batch == 3
        assert len(meta.camera_ids) == 3


class TestBAProblem:
    def test_obs_count_and_mask(self, scene, model):
        problem, meta = ba_problem_from_colmap(model, dtype=jnp.float64)
        assert meta.n_real_obs == len(scene.uv) or meta.n_real_obs <= len(scene.uv)
        assert int(np.array(problem.mask).sum()) == meta.n_real_obs
        assert problem.n_obs % 1024 == 0

    def test_gather_consistency(self, model):
        # For every real obs: points3d[pt_idx] must be the 3D point whose
        # COLMAP id the original 2D point referenced.
        problem, meta = ba_problem_from_colmap(model, dtype=jnp.float64)
        pt_idx = np.array(problem.pt_idx)
        cam_idx = np.array(problem.cam_idx)
        uv = np.array(problem.uv)
        mask = np.array(problem.mask) > 0
        id_to_xyz = {int(pid): model.points.xyz[r] for r, pid in enumerate(model.points.ids)}

        # Build oracle mapping from (cam, uv) -> point id via the CSR data.
        oracle = {}
        for i in range(len(model.images)):
            xy, p3d_ids = model.images.points2d_of(i)
            for j in range(len(xy)):
                if p3d_ids[j] >= 0:
                    oracle[(i, round(float(xy[j, 0]), 6), round(float(xy[j, 1]), 6))] = int(
                        p3d_ids[j]
                    )

        pts = np.array(problem.points3d)
        point_ids = meta.point_ids
        hits = 0
        for k in np.nonzero(mask)[0][:200]:
            key = (int(cam_idx[k]), round(float(uv[k, 0]), 6), round(float(uv[k, 1]), 6))
            pid = oracle[key]
            assert int(point_ids[pt_idx[k]]) == pid
            np.testing.assert_allclose(pts[pt_idx[k]], id_to_xyz[pid])
            hits += 1
        assert hits > 0

    def test_min_track_len_filter(self, model):
        # With a huge min track length nothing survives except well-observed
        # points; counts of each surviving point must be >= threshold.
        problem, meta = ba_problem_from_colmap(model, min_track_len=3, dtype=jnp.float64)
        pt_idx = np.array(problem.pt_idx)[np.array(problem.mask) > 0]
        counts = np.bincount(pt_idx, minlength=problem.n_points)
        assert counts[counts > 0].min() >= 3

    def test_points_per_camera_limit(self, model):
        problem, meta = ba_problem_from_colmap(
            model, points_per_camera_limit=10, dtype=jnp.float64
        )
        cam_idx = np.array(problem.cam_idx)[np.array(problem.mask) > 0]
        assert np.bincount(cam_idx).max() <= 10

    def test_padding_points_at_zero(self, model):
        problem, meta = ba_problem_from_colmap(model, dtype=jnp.float64)
        mask = np.array(problem.mask)
        assert np.all(np.array(problem.cam_idx)[mask == 0] == 0)
        assert np.all(np.array(problem.uv)[mask == 0] == 0)
