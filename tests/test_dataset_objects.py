"""Object-layer tests: CameraPose serialization, Dataset round-trips,
noising, reduction, CameraSet alignment.

Covers the reference's pose-file grammar (QT/RT/T + metadata header), the
with_noise semantics, make_reduced_dataset invariants, and the object-level
COLMAP loader against the packed codec.
"""

import numpy as np
import pytest

from tpu3drecon.dataset import (
    CameraPose,
    CameraSet,
    CoordinateSystem,
    Dataset,
    InvalidInputFormatErr,
    PoseFormat,
    TransformationDirection,
    export_in_colmap_format,
    load_colmap_cameras,
    load_colmap_dataset,
    make_scene,
    scene_to_colmap_model,
)
from tpu3drecon.io import colmap as cio


@pytest.fixture(scope="module")
def sparse_dir(tmp_path_factory):
    model = scene_to_colmap_model(make_scene(n_cameras=5, n_points=60, seed=41))
    d = tmp_path_factory.mktemp("sparse")
    cio.write_model(model, str(d), binary=True)
    return str(d)


class TestCameraPoseSerialization:
    def make_pose(self):
        from scipy.spatial.transform import Rotation

        return CameraPose(
            Rotation.random(random_state=np.random.RandomState(3)).as_matrix(),
            np.array([1.0, -2.0, 3.0]),
            identifier="test",
        )

    @pytest.mark.parametrize("fmt", [PoseFormat.QT, PoseFormat.RT, PoseFormat.T])
    def test_file_round_trip(self, fmt, tmp_path):
        pose = self.make_pose()
        path = tmp_path / "pose.txt"
        pose.to_file(path, pose_format=fmt)
        back = CameraPose.from_formatted_file(path)
        np.testing.assert_allclose(back.rotation, pose.rotation, atol=1e-9)
        np.testing.assert_allclose(back.translation, pose.translation, atol=1e-9)
        assert back.coordinate_system == pose.coordinate_system
        assert back.direction == pose.direction

    def test_invalid_string_raises(self):
        with pytest.raises(InvalidInputFormatErr):
            CameraPose.from_string_wxyz_quaternion_translation("1 2 3")
        with pytest.raises(InvalidInputFormatErr):
            CameraPose.from_string_rotation_translation("not a matrix")

    def test_inverse_invariants(self):
        # The reference test suite's core assertions (test_camera_poses.py:14-18).
        pose = self.make_pose()
        inv = pose.inverse()
        assert inv.direction == pose.direction.opposite()
        np.testing.assert_allclose(inv.rotation, pose.rotation.T, atol=1e-12)
        np.testing.assert_allclose(
            inv.translation, -pose.rotation.T @ pose.translation, atol=1e-12
        )
        back = inv.inverse()
        np.testing.assert_allclose(back.rotation, pose.rotation, atol=1e-12)

    def test_coordinate_conversion_conjugation(self):
        pose = self.make_pose()
        conv = pose.in_coordinate_system(CoordinateSystem.COLMAP)
        c = np.diag([1.0, -1.0, 1.0])
        np.testing.assert_allclose(conv.rotation, c @ pose.rotation @ c, atol=1e-12)
        np.testing.assert_allclose(conv.translation, c @ pose.translation, atol=1e-12)

    def test_apply_move_moves_center(self):
        pose = self.make_pose().in_direction(TransformationDirection.W2C)
        before = pose.position.copy()
        pose.apply_move(np.array([1.0, 0.0, 0.0]))
        np.testing.assert_allclose(pose.position, before + [1, 0, 0], atol=1e-9)


class TestObjectLoader:
    def test_load_counts(self, sparse_dir):
        ds = load_colmap_dataset(sparse_dir, binary=True, name="synthetic")
        assert ds.num_images() == 5
        assert ds.num_3d_points() == 60
        assert ds.name == "synthetic"
        assert all(
            e.camera.camera_pose.direction == TransformationDirection.W2C
            for e in ds.datasetEntries
        )

    def test_projection_consistency(self, sparse_dir):
        # Observations were exact projections: object-level reprojection
        # errors must be ~0.
        ds = load_colmap_dataset(sparse_dir, binary=True)
        errors = ds.compute_reprojection_errors_alt(lambda x: x)
        for arr in errors.values():
            assert len(arr) > 0
            np.testing.assert_allclose(arr, 0.0, atol=1e-8)

    def test_cameras_only_loader(self, sparse_dir):
        cams = load_colmap_cameras(sparse_dir, binary=True)
        assert len(cams) == 5
        assert all(c.camera_intrinsics.focal_x > 0 for c in cams.values())

    def test_export_round_trip(self, sparse_dir, tmp_path):
        ds = load_colmap_dataset(sparse_dir, binary=True)
        out = tmp_path / "exported"
        export_in_colmap_format(ds, str(out), binary=True)
        ds2 = load_colmap_dataset(str(out), binary=True)
        assert ds2.num_images() == ds.num_images()
        assert ds2.num_3d_points() == ds.num_3d_points()
        errors = ds2.compute_reprojection_errors_alt(lambda x: x)
        for arr in errors.values():
            np.testing.assert_allclose(arr, 0.0, atol=1e-8)


class TestNoising:
    def test_with_noise_perturbs_everything(self, sparse_dir):
        ds = load_colmap_dataset(sparse_dir, binary=True)
        noisy = Dataset.with_noise(ds, rng=np.random.default_rng(5))
        # Points moved by exactly the noise magnitude.
        d = np.linalg.norm(ds.points3D[0].xyz - noisy.points3D[0].xyz)
        np.testing.assert_allclose(d, 3e-2, atol=1e-9)
        # Poses moved; originals untouched.
        assert not np.allclose(
            ds.datasetEntries[0].camera.camera_pose.rotation,
            noisy.datasetEntries[0].camera.camera_pose.rotation,
        )
        # Reprojection error became visible.
        errs = noisy.compute_reprojection_errors_alt(lambda x: x)
        assert np.mean(np.concatenate(list(errs.values()))) > 1.0

    def test_reduction(self, sparse_dir):
        ds = load_colmap_dataset(sparse_dir, binary=True)
        reduced = ds.make_reduced_dataset(camera_limit=3, points_limit=20)
        assert reduced.num_images() == 3
        assert reduced.num_3d_points() <= 20 * 3
        # Surviving points are observed >= 2x among kept entries.
        from collections import Counter

        counts = Counter(
            p.point3D_identifier
            for e in reduced.datasetEntries
            for p in e.points_with_3d()
        )
        assert all(c >= 2 for c in counts.values())
        # Original untouched.
        assert ds.num_images() == 5


class TestCameraSet:
    def test_alignment_recovers_similarity(self, sparse_dir):
        cams = load_colmap_cameras(sparse_dir, binary=True)
        set_a = CameraSet([c.camera_pose for c in cams.values()], name="a")
        # Apply a known similarity to the positions via pose surgery.
        from scipy.spatial.transform import Rotation

        r = Rotation.from_rotvec([0.1, 0.2, -0.1]).as_matrix()
        scale, t = 1.7, np.array([2.0, -1.0, 0.5])
        moved = []
        for p in set_a.poses:
            q = CameraPose(
                p.rotation @ r.T,  # keep C2W consistent under conjugation
                scale * (r @ p.position) + t,
                identifier=p.identifier,
                coordinate_system=p.coordinate_system,
                direction=p.direction,
            )
            moved.append(q)
        set_b = CameraSet(moved, name="b")
        sim = set_a.compute_pose_matrix(set_b)
        np.testing.assert_allclose(float(sim.scale), scale, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(sim.rotation), r, atol=1e-8)

        sim_h = set_a.compute_pose_quaternion(set_b)
        np.testing.assert_allclose(float(sim_h.scale), scale, rtol=1e-6)

        errs = set_a.compute_set_errors(set_b, sim)
        assert all(v["position_error"] < 1e-6 for v in errs.values())

    def test_sparse_folder_round_trip(self, sparse_dir, tmp_path):
        set_a = CameraSet.from_sparse_folder(sparse_dir)
        assert len(set_a) == 5
        k = np.array([[1000.0, 0, 640], [0, 1000.0, 480], [0, 0, 1]])
        out = tmp_path / "camset"
        set_a.create_sparse_model(str(out), k, 1280, 960, binary=True)
        set_b = CameraSet.from_sparse_folder(str(out))
        np.testing.assert_allclose(set_a.positions(), set_b.positions(), atol=1e-9)

    def test_sparse_model_with_database_remap(self, sparse_dir, tmp_path):
        """database_path remaps image ids/filenames to the COLMAP sqlite
        feature database and drops poses absent from it (reference
        camera_set.py:61-124)."""
        import sqlite3

        from tpu3drecon.io import colmap as cio

        set_a = CameraSet.from_sparse_folder(sparse_dir)
        # A db covering only 3 of the 5 poses, with non-positional ids.
        db = tmp_path / "database.db"
        conn = sqlite3.connect(db)
        conn.execute("CREATE TABLE images (image_id INTEGER PRIMARY KEY, name TEXT)")
        kept = [set_a.poses[i] for i in (0, 2, 4)]
        db_ids = [17, 4, 99]
        for i, p in zip(db_ids, kept):
            conn.execute(
                "INSERT INTO images VALUES (?, ?)", (i, f"{p.identifier}.jpg")
            )
        conn.commit()
        conn.close()

        k = np.array([[1000.0, 0, 640], [0, 1000.0, 480], [0, 0, 1]])
        out = tmp_path / "remapped"
        set_a.create_sparse_model(
            str(out), k, 1280, 960, binary=True, database_path=str(db)
        )
        model = cio.read_model(str(out))
        assert sorted(np.asarray(model.images.image_ids).tolist()) == sorted(db_ids)
        assert sorted(model.images.names) == sorted(
            f"{p.identifier}.jpg" for p in kept
        )
