"""Mesh-sharded batched pose refinement (frame data parallelism).

The multi-frame tracking configuration (BASELINE.json config #4) at
multi-chip scale: the frame batch axis of a PoseProblem is sharded across
the mesh with NamedSharding annotations and the vmapped LM runs under plain
jit — XLA partitions the embarrassingly-parallel batch with zero collectives
(each frame's 8-dof solve is independent).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu3drecon.geometry.losses import RobustLoss
from tpu3drecon.parallel.mesh import make_mesh
from tpu3drecon.problems.packing import CameraParams, PoseProblem
from tpu3drecon.solvers.lm_core import LMConfig, lm_solve
from tpu3drecon.solvers.pose_refine import (
    pose_params_pack,
    pose_params_unpack,
    pose_residuals_per_axis,
)


def shard_pose_problem(
    problem: PoseProblem, mesh: Mesh, axis_name: str = "obs"
) -> PoseProblem:
    """Place a PoseProblem with the frame/batch axis sharded over the mesh.

    The batch must divide the mesh size; pad the problem batch (masked
    frames) if needed.
    """
    batch = NamedSharding(mesh, P(axis_name))
    rep = NamedSharding(mesh, P())

    put = jax.device_put
    return PoseProblem(
        cameras=CameraParams(
            rmats=put(problem.cameras.rmats, batch),
            tvecs=put(problem.cameras.tvecs, batch),
            fx_fy=put(problem.cameras.fx_fy, batch),
            cx_cy_skew=put(problem.cameras.cx_cy_skew, batch),
            dist=put(problem.cameras.dist, batch),
        ),
        points3d=put(problem.points3d, batch),
        points2d=put(problem.points2d, batch),
        mask=put(problem.mask, batch),
        avg_cam_width=put(problem.avg_cam_width, rep),
    )


def refine_poses_sharded(
    problem: PoseProblem,
    mesh: Optional[Mesh] = None,
    loss: RobustLoss = RobustLoss.CAUCHY,
    config: LMConfig = LMConfig(maxiter=100, gtol=1e-7),
    axis_name: str = "obs",
) -> Tuple[CameraParams, object]:
    """Refine every frame of a PoseProblem with the batch sharded over the
    mesh; returns (CameraParams, LMState) with batch-sharded outputs."""
    mesh = mesh or make_mesh(axis_name=axis_name)
    placed = shard_pose_problem(problem, mesh, axis_name)

    res_fn = functools.partial(pose_residuals_per_axis, loss=loss)

    def solve_one(params0, points3d, points2d, cx_cy_skew, dist, mask, norm):
        return lm_solve(
            res_fn, params0, points3d, points2d, cx_cy_skew, dist, mask, norm,
            config=config,
        )

    solver = jax.jit(jax.vmap(solve_one, in_axes=(0, 0, 0, 0, 0, 0, None)))
    params0 = pose_params_pack(placed.cameras)
    params, state = solver(
        params0,
        placed.points3d,
        placed.points2d,
        placed.cameras.cx_cy_skew,
        placed.cameras.dist,
        placed.mask,
        placed.avg_cam_width,
    )
    return (
        pose_params_unpack(params, placed.cameras.cx_cy_skew, placed.cameras.dist),
        state,
    )
