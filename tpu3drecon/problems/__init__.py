"""Packed problem containers and builders."""

from tpu3drecon.problems.from_dataset import (
    ba_problem_from_dataset,
    pose_problem_from_dataset,
)
from tpu3drecon.problems.grid import BAGridProblem, grid_from_flat
from tpu3drecon.problems.packing import (
    BAProblem,
    CameraParams,
    PoseProblem,
    ProblemMeta,
    ba_problem_from_colmap,
    bucket_size,
    pose_problem_from_colmap,
)
