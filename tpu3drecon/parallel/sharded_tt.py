"""Sharded track-table BA: the gather-free engine under a device mesh.

The track-table layout (problems/tt.py, solvers/ba_tt.py) shards along ONE
axis — the point/slot axis (last axis of every bucket plane) — and the
whole solve decomposes cleanly:

  - each device owns Pb/D columns of every bucket: its uv/mask planes, its
    one-hot columns (the O(C*slots) matrix divides by D — the layout's only
    scaling liability shrinks linearly with the mesh), its point parameters,
    and ALL point-side math (V, v_inv, g_pt, back-substituted dp) with zero
    replication and zero collectives;
  - the camera table (C x 19 floats) and the CG state are replicated; the
    only collectives in the entire solve are psums of (C, np)-sized camera
    reductions — one per linearization, one per CG matvec, one for b, plus
    scalar cost/pred/grad reductions.  Per CG iteration that is ~C*np*4
    bytes of all-reduce riding ICI (a few KB), vs the sharded-grid engine's
    two O(obs)-sized all_gathers.

Step-equivalence with the single-device tt engine is asserted in
tests/test_sharded_tt.py; the shared solve body lives in
solvers/ba_tt._ba_solve_tt_core (axis_name=None -> single chip).

No reference counterpart: the reference is single-device-only (SURVEY.md §2
parallelism inventory) and its jaxopt BA materializes dense Jacobians
(src/reconstruction/bundle_adjustment/bundle_adjustment.py:83-91).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu3drecon.parallel.mesh import mesh_key
from tpu3drecon.problems.grid import unpermute_points
from tpu3drecon.problems.packing import CameraParams
from tpu3drecon.problems.tt import BATTProblem, TTBucket
from tpu3drecon.solvers.ba_tt import _ba_solve_tt_core, _tt_state
from tpu3drecon.solvers.bundle_adjust import BAConfig, BAState
from tpu3drecon.solvers.trust_region import TRState

SHARD_AXIS = "shard"


class _TTView:
    """The fields _ba_solve_tt_core reads, as device-local shards."""

    def __init__(self, cameras, buckets, avg_cam_width):
        self.cameras = cameras
        self.buckets = buckets
        self.avg_cam_width = avg_cam_width


def _check_divisible(problem: BATTProblem, n_devices: int) -> None:
    for b in problem.buckets:
        pb = b.mask.shape[1]
        if pb % n_devices:
            raise ValueError(
                f"bucket point axis {pb} not divisible by mesh size "
                f"{n_devices}; rebuild with tt_from_flat(point_block=k*"
                f"{n_devices})"
            )


def shard_tt_problem(
    problem: BATTProblem, mesh: Mesh, axis_name: str = SHARD_AXIS
) -> Tuple[Tuple[TTBucket, ...], Tuple[jax.Array, ...], CameraParams, jax.Array]:
    """Place a track-table problem on the mesh.

    Returns (buckets, pts_planes, cameras, avg_cam_width) with every bucket
    plane and per-bucket point planes (3, Pb) sharded on the point axis and
    the camera table replicated.
    """
    _check_divisible(problem, mesh.devices.size)
    rep = NamedSharding(mesh, P())
    pt2 = NamedSharding(mesh, P(None, axis_name))
    pt3 = NamedSharding(mesh, P(None, None, axis_name))
    from tpu3drecon.utils.placement import sharded_put as put

    def onehot3(b: TTBucket) -> jax.Array:
        # Single-chip problems store the one-hot flat (C, Tb*Pb); the point
        # axis needs its own dimension to carry a PartitionSpec, so
        # re-materialize (host-side numpy reshape — the flat order is
        # n = t*Pb + p, row-major, so this is a view).
        if b.onehot.ndim == 3:
            return b.onehot
        tb, pb = b.mask.shape
        import numpy as np

        return jnp.asarray(
            np.asarray(jax.device_get(b.onehot)).reshape(-1, tb, pb)
        )

    buckets = tuple(
        TTBucket(
            uv=put(b.uv, pt3),
            mask=put(b.mask, pt2),
            cam_ids=put(b.cam_ids, pt2),
            onehot=put(onehot3(b), pt3),
        )
        for b in problem.buckets
    )
    pts = tuple(
        put(jnp.asarray(problem.points3d[off : off + b.mask.shape[1]].T), pt2)
        for b, off in zip(problem.buckets, problem.bucket_offsets)
    )
    cams = jax.tree_util.tree_map(lambda x: put(x, rep), problem.cameras)
    return buckets, pts, cams, put(problem.avg_cam_width, rep)


def ba_solve_tt_sharded(
    problem: BATTProblem,
    config: BAConfig = BAConfig(),
    mesh: Optional[Mesh] = None,
    axis_name: Optional[str] = None,
) -> Tuple[CameraParams, jax.Array, BAState]:
    """Sharded track-table BA solve; replicated outputs matching
    ba_solve_tt (points un-permuted)."""
    if mesh is None:
        from tpu3drecon.parallel.mesh import make_mesh

        mesh = make_mesh(axis_name=axis_name or SHARD_AXIS)
    axis_name = axis_name or mesh.axis_names[0]
    buckets, pts, cams, avg_w = shard_tt_problem(problem, mesh, axis_name)
    solver = make_sharded_tt_solver(mesh, config, axis_name, len(buckets))
    cameras_out, pts_out, final = solver(buckets, pts, cams, avg_w)
    points3d = jnp.concatenate([p.T for p in pts_out], axis=0)
    pts_full = unpermute_points(points3d, problem)
    state = _tt_state(cameras_out, pts_full, final)
    return cameras_out, pts_full, state


_SHARDED_TT_CACHE: dict = {}


def make_sharded_tt_solver(
    mesh: Mesh,
    config: BAConfig = BAConfig(),
    axis_name: str = SHARD_AXIS,
    n_buckets: int = 1,
):
    """Jitted shard_map track-table solver for a mesh + config (cached)."""
    from tpu3drecon.solvers.bundle_adjust import (
        DynamicBAParams,
        merge_dynamic_config,
        split_dynamic_config,
    )

    static, dyn = split_dynamic_config(config)
    key = (mesh_key(mesh), static, axis_name, n_buckets)
    if key in _SHARDED_TT_CACHE:
        jfn = _SHARDED_TT_CACHE[key]
        return lambda *a, _j=jfn, _d=dyn: _j(*a, _d)

    rep = P()
    pt2 = P(None, axis_name)
    pt3 = P(None, None, axis_name)
    bucket_spec = TTBucket(uv=pt3, mask=pt2, cam_ids=pt2, onehot=pt3)
    cam_spec = CameraParams(rmats=rep, tvecs=rep, fx_fy=rep, cx_cy_skew=rep, dist=rep)
    in_specs = (
        tuple(bucket_spec for _ in range(n_buckets)),
        tuple(pt2 for _ in range(n_buckets)),
        cam_spec,
        rep,
    )
    final_spec = TRState(
        params=None, loss=rep, lam=rep, nu=rep, iter_num=rep, accepted=rep,
        grad_norm=rep, converged=rep, cg_iters=rep, gain=rep,
    )
    out_specs = (
        cam_spec,
        tuple(pt2 for _ in range(n_buckets)),
        final_spec,
    )

    def local(buckets, pts, cams, avg_w, d):
        view = _TTView(cams, buckets, avg_w)
        cameras_out, pts_out, final = _ba_solve_tt_core(
            view, pts, merge_dynamic_config(static, d), axis_name
        )
        # Outputs: cameras replicated already (identical on every device);
        # pts_out are the local point shards; scalars replicated.
        return cameras_out, pts_out, final._replace(params=None)

    rep_dyn = DynamicBAParams(*(rep for _ in DynamicBAParams._fields))

    def solve(buckets, pts, cams, avg_w, dyn_in):
        sharded = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=in_specs + (rep_dyn,),
            out_specs=out_specs,
            check_vma=False,
        )
        with jax.default_matmul_precision("highest"):
            return sharded(buckets, pts, cams, avg_w, dyn_in)

    jfn = jax.jit(solve)
    _SHARDED_TT_CACHE[key] = jfn
    return lambda *a, _j=jfn, _d=dyn: _j(*a, _d)
