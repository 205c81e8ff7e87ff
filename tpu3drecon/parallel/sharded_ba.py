"""Mesh-sharded bundle adjustment via shard_map.

Runs the exact solver from tpu3drecon.solvers.bundle_adjust inside
``jax.shard_map`` with the observation axis sharded across the mesh — the
BA analog of sequence parallelism (SURVEY.md §5): each device linearizes its
observation shard and reduces its JtJ/gradient contributions with psum over
ICI; cameras and points stay replicated, so every device runs the identical
trust-region/CG control flow in lockstep and the result is bitwise-replicated.

Communication per outer iteration: one psum of (C,8,8)+(P,3,3)+grads at
linearization, two psums — (P,3) and (C,8) — per CG iteration.  No NCCL/MPI
analog exists in the reference (single device); XLA owns the transport here.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, PartitionSpec as P

from tpu3drecon.parallel.mesh import OBS_AXIS, make_mesh, mesh_key, shard_ba_problem
from tpu3drecon.problems.packing import BAProblem, CameraParams
from tpu3drecon.solvers.bundle_adjust import BAConfig, BAState, ba_solve


def _problem_in_specs(axis_name: str) -> BAProblem:
    """PartitionSpecs matching shard_ba_problem's placement."""
    return BAProblem(
        cameras=CameraParams(
            rmats=P(), tvecs=P(), fx_fy=P(), cx_cy_skew=P(), dist=P()
        ),
        points3d=P(),
        cam_idx=P(axis_name),
        pt_idx=P(axis_name),
        uv=P(axis_name),
        mask=P(axis_name),
        avg_cam_width=P(),
    )


_SHARDED_BA_CACHE: dict = {}


def make_sharded_ba_solver(
    mesh: Mesh,
    config: BAConfig = BAConfig(),
    axis_name: str = OBS_AXIS,
):
    """Build a jitted sharded BA solver for a mesh + config (cached).

    The returned callable takes a BAProblem already placed with
    ``shard_ba_problem`` (or any BAProblem — jit will reshard as needed) and
    returns (CameraParams, points3d, BAState) replicated.  Loop bounds and
    tolerances ride in as replicated dynamic operands (one compile per
    static config; see solvers.bundle_adjust.split_dynamic_config).
    """
    from tpu3drecon.solvers.bundle_adjust import (
        DynamicBAParams,
        merge_dynamic_config,
        split_dynamic_config,
    )

    static, dyn = split_dynamic_config(config)
    key = (mesh_key(mesh), static, axis_name)
    jfn = _SHARDED_BA_CACHE.get(key)
    if jfn is None:
        def local(problem, d):
            return ba_solve(
                problem, merge_dynamic_config(static, d), axis_name=axis_name
            )

        rep_dyn = DynamicBAParams(*(P() for _ in DynamicBAParams._fields))
        sharded = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(_problem_in_specs(axis_name), rep_dyn),
            out_specs=(
                CameraParams(rmats=P(), tvecs=P(), fx_fy=P(), cx_cy_skew=P(), dist=P()),
                P(),
                BAState(
                    rmats=P(), tvecs=P(), fx_fy=P(), points3d=P(), loss=P(),
                    lam=P(), nu=P(), iter_num=P(), accepted=P(), grad_norm=P(),
                    converged=P(), cg_iters=P(), gain=P(),
                ),
            ),
            check_vma=False,
        )
        jfn = jax.jit(sharded)
        _SHARDED_BA_CACHE[key] = jfn
    return lambda placed, _j=jfn, _d=dyn: _j(placed, _d)


def ba_solve_sharded(
    problem: BAProblem,
    config: BAConfig = BAConfig(),
    mesh: Optional[Mesh] = None,
    axis_name: str = OBS_AXIS,
) -> Tuple[CameraParams, jax.Array, BAState]:
    """One-call sharded BA: build mesh (all devices), place, solve."""
    mesh = mesh or make_mesh(axis_name=axis_name)
    placed = shard_ba_problem(problem, mesh, axis_name)
    solver = make_sharded_ba_solver(mesh, config, axis_name)
    return solver(placed)
