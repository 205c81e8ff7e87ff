"""Repo-level paths and the typed run configuration tree.

Extends the reference's path constants (reference: src/config.py:4-11) into
the single typed config tree recommended by SURVEY.md §5: dataset paths,
solver settings, mesh shape, and benchmark scale in one dataclass that
drivers thread through.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional, Tuple

REPO_PATH = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATASETS_PATH = os.environ.get(
    "TPU3DRECON_DATASETS", os.path.join(REPO_PATH, "datasets")
)
BENCHMARK_RESULTS_PATH = os.environ.get(
    "TPU3DRECON_RESULTS", os.path.join(REPO_PATH, "benchmark_results")
)
BENCHMARK_SINGLE_POSE_RESULTS_PATH = os.path.join(
    BENCHMARK_RESULTS_PATH, "single_pose"
)
BENCHMARK_BUNDLE_ADJUSTMENT_RESULTS_PATH = os.path.join(
    BENCHMARK_RESULTS_PATH, "bundle_adjustment"
)
EVALUATION_PATH = os.path.join(REPO_PATH, "evaluation")


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh shape (1-D over the observation axis by default)."""

    n_devices: Optional[int] = None  # None = all
    axis_name: str = "obs"


@dataclass(frozen=True)
class SolverSettings:
    """User-facing solver knobs (lowered into LMConfig/BAConfig)."""

    maxiter: int = 100
    tol: float = 1e-7
    cg_maxiter: int = 100
    cg_rtol: float = 1e-5
    loss: str = "cauchy"
    dtype: str = "float32"


@dataclass(frozen=True)
class BenchmarkScale:
    """Problem-size caps (reference's points_limit=400/camera_limit=15
    defaults lifted to the 100-camera scale our solver handles)."""

    camera_limit: Optional[int] = None
    points_limit: Optional[int] = None


@dataclass(frozen=True)
class RunConfig:
    solver: SolverSettings = field(default_factory=SolverSettings)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    scale: BenchmarkScale = field(default_factory=BenchmarkScale)
    results_root: str = BENCHMARK_RESULTS_PATH
