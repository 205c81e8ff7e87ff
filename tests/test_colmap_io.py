"""COLMAP I/O tests: bin/txt round-trips and bin<->txt consistency.

Formalizes the reference's implicit smoke checks (its parser __main__ blocks
parse bin AND txt of the same model — cameras.py:67-69, images.py:71-73,
points.py:62-64) as real assertions, plus write->read round-trips the
reference never had.
"""

import numpy as np
import pytest

from tpu3drecon.dataset.synthetic import make_scene, scene_to_colmap_model
from tpu3drecon.io import colmap as cio


@pytest.fixture(scope="module")
def model():
    return scene_to_colmap_model(make_scene(n_cameras=5, n_points=80, seed=11))


def assert_models_equal(a, b, xy_atol=0.0):
    assert set(a.cameras) == set(b.cameras)
    for cid in a.cameras:
        ca, cb = a.cameras[cid], b.cameras[cid]
        assert ca.model == cb.model
        assert (ca.width, ca.height) == (cb.width, cb.height)
        np.testing.assert_allclose(ca.params, cb.params, atol=xy_atol)
    ia, ib = a.images, b.images
    np.testing.assert_array_equal(ia.image_ids, ib.image_ids)
    np.testing.assert_allclose(ia.qvecs, ib.qvecs, atol=xy_atol)
    np.testing.assert_allclose(ia.tvecs, ib.tvecs, atol=xy_atol)
    np.testing.assert_array_equal(ia.camera_ids, ib.camera_ids)
    assert ia.names == ib.names
    np.testing.assert_array_equal(ia.p2d_offsets, ib.p2d_offsets)
    np.testing.assert_allclose(ia.p2d_xy, ib.p2d_xy, atol=xy_atol)
    np.testing.assert_array_equal(ia.p2d_point3d_ids, ib.p2d_point3d_ids)
    pa, pb = a.points, b.points
    np.testing.assert_array_equal(pa.ids, pb.ids)
    np.testing.assert_allclose(pa.xyz, pb.xyz, atol=xy_atol)
    np.testing.assert_array_equal(pa.rgb, pb.rgb)
    np.testing.assert_allclose(pa.error, pb.error, atol=xy_atol)
    np.testing.assert_array_equal(pa.track_offsets, pb.track_offsets)
    np.testing.assert_array_equal(pa.track_image_ids, pb.track_image_ids)
    np.testing.assert_array_equal(pa.track_p2d_idxs, pb.track_p2d_idxs)


class TestBinaryRoundTrip:
    def test_write_read_identical(self, model, tmp_path):
        cio.write_model(model, str(tmp_path / "sparse"), binary=True)
        back = cio.read_model(str(tmp_path / "sparse"), binary=True)
        assert_models_equal(model, back)

    def test_autodetect_binary(self, model, tmp_path):
        cio.write_model(model, str(tmp_path / "sparse"), binary=True)
        back = cio.read_model(str(tmp_path / "sparse"))
        assert_models_equal(model, back)


class TestTextRoundTrip:
    def test_write_read_identical(self, model, tmp_path):
        cio.write_model(model, str(tmp_path / "sparse"), binary=False)
        back = cio.read_model(str(tmp_path / "sparse"), binary=False)
        # repr() float formatting is exact for round-trip.
        assert_models_equal(model, back)


class TestBinTxtConsistency:
    def test_same_model_both_formats(self, model, tmp_path):
        cio.write_model(model, str(tmp_path / "bin"), binary=True)
        cio.write_model(model, str(tmp_path / "txt"), binary=False)
        mb = cio.read_model(str(tmp_path / "bin"))
        mt = cio.read_model(str(tmp_path / "txt"))
        assert_models_equal(mb, mt)


class TestSentinels:
    def test_invalid_point3d_id_round_trip(self, model, tmp_path):
        # Null some associations: they must survive bin round-trip as -1
        # (COLMAP stores uint64-max; reference images.py:47-52 special-cases it).
        import dataclasses

        ids = model.images.p2d_point3d_ids.copy()
        ids[::3] = -1
        images = dataclasses.replace(model.images, p2d_point3d_ids=ids)
        m2 = dataclasses.replace(model, images=images)
        cio.write_model(m2, str(tmp_path / "sparse"), binary=True)
        back = cio.read_model(str(tmp_path / "sparse"))
        np.testing.assert_array_equal(back.images.p2d_point3d_ids[::3], -1)
        assert (back.images.p2d_point3d_ids >= 0).sum() == (ids >= 0).sum()


class TestCameraModels:
    def test_simple_radial_intrinsics(self):
        cam = cio.ColmapCamera(
            camera_id=1,
            model=cio.CameraModelType.SIMPLE_RADIAL,
            width=1000,
            height=800,
            params=np.array([900.0, 500.0, 400.0, 0.05]),
        )
        fx, fy, cx, cy, skew = cam.intrinsics_tuple()
        assert fx == fy == 900.0
        assert (cx, cy) == (500.0, 400.0)
        np.testing.assert_allclose(cam.distortion_params(), [0.05])

    def test_pinhole_intrinsics(self):
        cam = cio.ColmapCamera(
            camera_id=1,
            model=cio.CameraModelType.PINHOLE,
            width=1000,
            height=800,
            params=np.array([900.0, 950.0, 500.0, 400.0]),
        )
        fx, fy, cx, cy, skew = cam.intrinsics_tuple()
        assert (fx, fy) == (900.0, 950.0)
        assert cam.distortion_params().size == 0
