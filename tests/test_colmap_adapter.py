"""COLMAP adapter: report parsing + CLI round-trip via a stub binary.

pycolmap / the colmap binary don't ship in this image (and installs are
prohibited), so these tests pin the adapter's logic against a recorded
Ceres-style stdout fixture and a stub executable — the paths that were dead
code in round 1.
"""

import os
import stat

import pytest

from tpu3drecon.benchmark.adapters.colmap_adapter import (
    BaselineUnavailable,
    BundleAdjustmentOptions,
    parse_ba_report,
    perform_bundle_adjustment,
)

# Recorded shape of `colmap bundle_adjuster` stdout (Ceres self-report as
# COLMAP prints it; values synthetic).
CERES_STDOUT = """\
==============================================================================
Global bundle adjustment
==============================================================================

iter      cost      cost_change  |gradient|   |step|    tr_ratio  ls_iter  iter_time  total_time
   0  1.204895e+02    0.00e+00    1.84e+02   0.00e+00   0.00e+00        0    8.21e-02   1.62e-01
   1  4.923011e+01    7.13e+01    4.62e+01   1.36e+00   9.96e-01       18    1.94e-01   3.56e-01

Bundle adjustment report
------------------------
    Residuals : 59196
   Parameters : 23541
   Iterations : 27
         Time : 1.30671 [s]
 Initial cost : 0.798092 [px]
   Final cost : 0.296306 [px]
  Termination : Convergence
"""


class TestParseBaReport:
    def test_full_report(self):
        r = parse_ba_report(CERES_STDOUT)
        assert r.residuals == 59196
        assert r.parameters == 23541
        assert r.iterations == 27
        assert r.time == pytest.approx(1.30671)
        assert r.initial_cost == pytest.approx(0.798092)
        assert r.final_cost == pytest.approx(0.296306)
        assert r.termination == "Convergence"
        assert r.raw_stdout == CERES_STDOUT

    def test_partial_report_leaves_none(self):
        r = parse_ba_report("Iterations : 3\nsome noise\n")
        assert r.iterations == 3
        assert r.time is None
        assert r.final_cost is None

    def test_no_failure_termination(self):
        r = parse_ba_report("  Termination : NO_CONVERGENCE\n")
        assert r.termination == "NO_CONVERGENCE"


class TestCliRoundTrip:
    def test_missing_binary_raises_baseline_unavailable(self, tmp_path, monkeypatch):
        monkeypatch.setenv("COLMAP_BIN", str(tmp_path / "nope"))
        monkeypatch.setenv("PATH", str(tmp_path))
        with pytest.raises(BaselineUnavailable, match="colmap binary not found"):
            perform_bundle_adjustment(str(tmp_path), str(tmp_path / "out"))

    def test_stub_binary_round_trip(self, tmp_path, monkeypatch):
        # A stand-in colmap executable emitting the recorded report: pins the
        # subprocess plumbing, arg assembly, and parse in one pass.
        stub = tmp_path / "colmap"
        stub.write_text(
            "#!/bin/sh\n"
            'echo "$@" > "%s/args.txt"\n' % tmp_path
            + "cat <<'EOF'\n" + CERES_STDOUT + "EOF\n"
        )
        stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
        monkeypatch.setenv("COLMAP_BIN", str(stub))
        out_dir = tmp_path / "out"
        opts = BundleAdjustmentOptions(max_num_iterations=55, refine_principal_point=True)
        report = perform_bundle_adjustment(str(tmp_path), str(out_dir), opts)
        assert report.iterations == 27
        assert report.final_cost == pytest.approx(0.296306)
        assert report.termination == "Convergence"
        assert out_dir.is_dir()
        args = (tmp_path / "args.txt").read_text()
        assert "--BundleAdjustment.max_num_iterations 55" in args
        assert "--BundleAdjustment.refine_principal_point 1" in args
        assert f"--input_path {tmp_path}" in args

    def test_failing_binary_raises_with_stderr(self, tmp_path, monkeypatch):
        stub = tmp_path / "colmap"
        stub.write_text("#!/bin/sh\necho boom >&2\nexit 3\n")
        stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
        monkeypatch.setenv("COLMAP_BIN", str(stub))
        with pytest.raises(RuntimeError, match=r"failed \(3\).*boom") as e:
            perform_bundle_adjustment(str(tmp_path), str(tmp_path / "out"))
        assert not isinstance(e.value, BaselineUnavailable)

    def test_wall_time_fallback_when_report_lacks_time(self, tmp_path, monkeypatch):
        stub = tmp_path / "colmap"
        stub.write_text('#!/bin/sh\necho "Iterations : 5"\n')
        stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
        monkeypatch.setenv("COLMAP_BIN", str(stub))
        report = perform_bundle_adjustment(str(tmp_path), str(tmp_path / "out"))
        assert report.iterations == 5
        assert report.time is not None and report.time > 0


class TestFullBenchmarkRoundTrip:
    def test_ba_benchmark_with_stub_binary(self, tmp_path, monkeypatch):
        """The complete C19 path: export the dataset in COLMAP format, invoke
        the (stub) bundle_adjuster, read the optimized model back.  The stub
        copies input -> output, so the read-back must reproduce the input."""
        from tpu3drecon.benchmark.adapters.colmap_adapter import (
            ColmapBundleAdjustmentBenchmark,
        )
        from tpu3drecon.benchmark.datasets import get_dataset

        stub = tmp_path / "colmap"
        stub.write_text(
            "#!/bin/sh\n"
            "# args: bundle_adjuster --input_path IN --output_path OUT ...\n"
            'in=""; out=""\n'
            'while [ $# -gt 0 ]; do\n'
            '  case "$1" in\n'
            "    --input_path) in=$2; shift 2;;\n"
            "    --output_path) out=$2; shift 2;;\n"
            "    *) shift;;\n"
            "  esac\n"
            "done\n"
            'cp "$in"/* "$out"/\n'
            + "cat <<'EOF'\n" + CERES_STDOUT + "EOF\n"
        )
        stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
        monkeypatch.setenv("COLMAP_BIN", str(stub))

        ds = get_dataset("synthetic_small_noised")
        bench = ColmapBundleAdjustmentBenchmark(ds)
        bench.benchmark(work_dir=str(tmp_path / "work"))
        assert bench.report.termination == "Convergence"
        assert bench.iterations == [27]
        assert len(bench.results.camera_mapping) == len(ds.datasetEntries)
        assert len(bench.results.point_mapping) == len(ds.points3D)


class TestGtsamGating:
    def test_gtsam_missing_raises_baseline_unavailable(self):
        try:
            import gtsam  # noqa: F401

            pytest.skip("gtsam installed; gating path not reachable")
        except ImportError:
            pass
        from tpu3drecon.benchmark.adapters.gtsam_adapter import (
            GtsamBundleAdjustmentBenchmark,
        )
        from tpu3drecon.benchmark.datasets import get_dataset

        bench = GtsamBundleAdjustmentBenchmark(get_dataset("synthetic_small_noised"))
        with pytest.raises(BaselineUnavailable, match="gtsam"):
            bench.benchmark()


class TestSinglePoseGating:
    def test_pycolmap_missing_raises_baseline_unavailable(self):
        try:
            import pycolmap  # noqa: F401

            pytest.skip("pycolmap installed; gating path not reachable")
        except ImportError:
            pass
        from tpu3drecon.benchmark.adapters.colmap_adapter import ColmapSinglePoseBenchmark
        from tpu3drecon.benchmark.datasets import get_dataset

        bench = ColmapSinglePoseBenchmark(get_dataset("synthetic_small_noised"))
        with pytest.raises(BaselineUnavailable, match="pycolmap"):
            bench.benchmark()

    def test_gtsam_single_pose_gating(self):
        try:
            import gtsam  # noqa: F401

            pytest.skip("gtsam installed; gating path not reachable")
        except ImportError:
            pass
        from tpu3drecon.benchmark.adapters.gtsam_adapter import GtsamSinglePoseBenchmark
        from tpu3drecon.benchmark.datasets import get_dataset

        bench = GtsamSinglePoseBenchmark(get_dataset("synthetic_small_noised"))
        with pytest.raises(BaselineUnavailable, match="gtsam"):
            bench.benchmark()
