"""Native C++ COLMAP parser vs the numpy oracle, plus a speed sanity check."""

import time

import numpy as np
import pytest

from tpu3drecon.dataset.synthetic import make_scene, scene_to_colmap_model
from tpu3drecon.io import colmap as cio
from tpu3drecon.io.colmap import native
from tpu3drecon.io.colmap.binary import read_images_bin, read_points3d_bin


@pytest.fixture(scope="module")
def lib():
    lib = native.load_library()
    if lib is None:
        pytest.skip("native parser unavailable (no g++/make)")
    return lib


@pytest.fixture(scope="module")
def sparse_dir(tmp_path_factory):
    model = scene_to_colmap_model(
        make_scene(n_cameras=12, n_points=2000, obs_per_camera=500, seed=71)
    )
    d = tmp_path_factory.mktemp("native_sparse")
    cio.write_model(model, str(d), binary=True)
    return str(d)


class TestNativeMatchesPython:
    def test_points3d(self, lib, sparse_dir):
        py = read_points3d_bin(f"{sparse_dir}/points3D.bin", use_native=False)
        nt = native.read_points3d_bin_native(f"{sparse_dir}/points3D.bin")
        np.testing.assert_array_equal(py.ids, nt.ids)
        np.testing.assert_array_equal(py.xyz, nt.xyz)
        np.testing.assert_array_equal(py.rgb, nt.rgb)
        np.testing.assert_array_equal(py.error, nt.error)
        np.testing.assert_array_equal(py.track_offsets, nt.track_offsets)
        np.testing.assert_array_equal(py.track_image_ids, nt.track_image_ids)
        np.testing.assert_array_equal(py.track_p2d_idxs, nt.track_p2d_idxs)

    def test_images(self, lib, sparse_dir):
        py = read_images_bin(f"{sparse_dir}/images.bin", use_native=False)
        nt = native.read_images_bin_native(f"{sparse_dir}/images.bin")
        np.testing.assert_array_equal(py.image_ids, nt.image_ids)
        np.testing.assert_array_equal(py.qvecs, nt.qvecs)
        np.testing.assert_array_equal(py.tvecs, nt.tvecs)
        np.testing.assert_array_equal(py.camera_ids, nt.camera_ids)
        assert py.names == nt.names
        np.testing.assert_array_equal(py.p2d_offsets, nt.p2d_offsets)
        np.testing.assert_array_equal(py.p2d_xy, nt.p2d_xy)
        np.testing.assert_array_equal(py.p2d_point3d_ids, nt.p2d_point3d_ids)

    def test_sentinel_ids(self, lib, tmp_path):
        import dataclasses

        model = scene_to_colmap_model(make_scene(n_cameras=3, n_points=40, seed=72))
        ids = model.images.p2d_point3d_ids.copy()
        ids[::2] = -1
        model = dataclasses.replace(
            model, images=dataclasses.replace(model.images, p2d_point3d_ids=ids)
        )
        cio.write_model(model, str(tmp_path), binary=True)
        nt = native.read_images_bin_native(f"{tmp_path}/images.bin")
        np.testing.assert_array_equal(nt.p2d_point3d_ids[::2], -1)

    def test_truncated_file_rejected(self, lib, sparse_dir, tmp_path):
        data = open(f"{sparse_dir}/points3D.bin", "rb").read()
        bad = tmp_path / "points3D.bin"
        bad.write_bytes(data[: len(data) // 2])
        with pytest.raises(ValueError, match="corrupt"):
            native.read_points3d_bin_native(str(bad))

    def test_overflowing_track_len_rejected(self, lib, tmp_path):
        # A crafted track_len near 2^64/8 makes `track_len * 8` wrap uint64;
        # a multiplying bounds check would pass and the parse loop would then
        # write out of bounds. Must be rejected, not crash.
        import struct

        crafted = struct.pack("<Q", 1)  # one point
        crafted += struct.pack("<Q", 7)  # id
        crafted += struct.pack("<3d", 0.0, 0.0, 0.0)  # xyz
        crafted += bytes(3)  # rgb
        crafted += struct.pack("<d", 0.0)  # error
        crafted += struct.pack("<Q", (1 << 61) + 5)  # track_len: *8 wraps to 40
        crafted += bytes(40)
        bad = tmp_path / "points3D.bin"
        bad.write_bytes(crafted)
        with pytest.raises(ValueError, match="corrupt"):
            native.read_points3d_bin_native(str(bad))

    def test_overflowing_p2d_count_rejected(self, lib, tmp_path):
        import struct

        crafted = struct.pack("<Q", 1)  # one image
        crafted += struct.pack("<I", 1)  # image id
        crafted += struct.pack("<4d", 1.0, 0.0, 0.0, 0.0)  # qvec
        crafted += struct.pack("<3d", 0.0, 0.0, 0.0)  # tvec
        crafted += struct.pack("<I", 1)  # camera id
        crafted += b"img\x00"  # name
        crafted += struct.pack("<Q", (1 << 61) + 3)  # n_p2d: *24 wraps small
        crafted += bytes(72)
        bad = tmp_path / "images.bin"
        bad.write_bytes(crafted)
        with pytest.raises(ValueError, match="corrupt"):
            native.read_images_bin_native(str(bad))


class TestNativeSpeed:
    def test_faster_than_python(self, lib, tmp_path_factory):
        # A larger model where parsing cost matters.
        model = scene_to_colmap_model(
            make_scene(n_cameras=20, n_points=20000, obs_per_camera=2000, seed=73)
        )
        d = tmp_path_factory.mktemp("speed")
        cio.write_model(model, str(d), binary=True)
        path = f"{d}/points3D.bin"

        t0 = time.perf_counter()
        read_points3d_bin(path, use_native=False)
        t_py = time.perf_counter() - t0
        t0 = time.perf_counter()
        native.read_points3d_bin_native(path)
        t_nt = time.perf_counter() - t0
        assert t_nt < t_py, f"native {t_nt:.4f}s vs python {t_py:.4f}s"


class TestTruncationFuzz:
    def test_native_and_python_agree_on_truncations(self, lib, sparse_dir, tmp_path):
        # Every truncation point must be rejected by BOTH parsers (never a
        # silent partial parse by one of them).
        import random

        data = open(f"{sparse_dir}/points3D.bin", "rb").read()
        rng = random.Random(0)
        for cut in sorted(rng.sample(range(9, len(data) - 1), 12)):
            bad = tmp_path / "points3D.bin"
            bad.write_bytes(data[:cut])
            native_err = python_err = False
            try:
                native.read_points3d_bin_native(str(bad))
            except Exception:
                native_err = True
            try:
                read_points3d_bin(str(bad), use_native=False)
            except Exception:
                python_err = True
            assert native_err and python_err, f"cut={cut}: native_err={native_err} python_err={python_err}"


class TestNativeBalTokenizer:
    def test_native_matches_python(self, lib, tmp_path):
        import numpy as np

        from tpu3drecon.io.bal import read_bal, write_bal

        rng = np.random.default_rng(17)
        n_c, n_p, n_o = 4, 60, 180
        cam_idx = rng.integers(0, n_c, n_o).astype(np.int32)
        pt_idx = rng.integers(0, n_p, n_o).astype(np.int32)
        uv = rng.normal(size=(n_o, 2)) * 300
        cam_params = rng.normal(size=(n_c, 9))
        points = rng.normal(size=(n_p, 3))
        path = tmp_path / "p.txt"
        write_bal(str(path), cam_idx, pt_idx, uv, cam_params, points)

        native = read_bal(str(path), use_native=True)
        python = read_bal(str(path), use_native=False)
        for a, b in zip(native, python):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_native_faster_on_large_file(self, lib, tmp_path):
        import time

        import numpy as np

        from tpu3drecon.io.bal import read_bal, write_bal

        rng = np.random.default_rng(18)
        n_c, n_p, n_o = 50, 40_000, 160_000
        write_bal(
            str(tmp_path / "big.txt"),
            rng.integers(0, n_c, n_o).astype(np.int32),
            rng.integers(0, n_p, n_o).astype(np.int32),
            rng.normal(size=(n_o, 2)) * 300,
            rng.normal(size=(n_c, 9)),
            rng.normal(size=(n_p, 3)),
        )
        p = str(tmp_path / "big.txt")
        t0 = time.perf_counter()
        read_bal(p, use_native=False)
        t_py = time.perf_counter() - t0
        t0 = time.perf_counter()
        read_bal(p, use_native=True)
        t_nt = time.perf_counter() - t0
        assert t_nt < t_py, f"native {t_nt:.3f}s vs python {t_py:.3f}s"

    def test_truncated_rejected_by_both(self, lib, tmp_path):
        import pytest as _pytest

        from tpu3drecon.io.bal import read_bal

        bad = tmp_path / "bad.txt"
        bad.write_text("3 2 1\n0 0 1.0")
        for use_native in (True, False):
            with _pytest.raises(ValueError, match="corrupt BAL file.*promises 3 cams"):
                read_bal(str(bad), use_native=use_native)
