"""Sharded windowed track-table BA: BAL-scale camera counts on a mesh.

The wtt layout (problems/wtt.py, solvers/ba_wtt.py) shards along its CHUNK
axis — the leading axis of every bucket array — and the solve decomposes
exactly like the sharded dense track table (parallel/sharded_tt.py):

  - each device owns G/D chunks of every bucket: its uv/mask planes, its
    windowed one-hots (the layout's dominant array divides by D), its
    cam_base rows, its point parameters, and ALL point-side math (V,
    v_inv, g_pt, back-substituted dp) with zero replication;
  - the camera table (c_pad x 19 floats) and CG state are replicated; the
    only collectives are psums of (c_pad, np)-sized camera reductions —
    one per linearization, one per CG matvec, one for b, plus scalar
    cost/pred/grad reductions.  Per CG iteration that is ~c_pad*np*4
    bytes of all-reduce riding ICI, independent of the observation count.

Combined with the windowed one-hot's O(W * slots) memory this is the
BAL-scale multi-chip path: Ladybug-1723-class problems fit at ~4 GB of
one-hots on ONE chip and divide linearly across the mesh.

Step-equivalence with the single-device wtt engine is asserted in
tests/test_sharded_wtt.py; the shared solve body is
solvers/ba_wtt._ba_solve_wtt_core (axis_name=None -> single chip).

No reference counterpart: the reference is single-device-only (SURVEY.md
§2 parallelism inventory) and its jaxopt BA materializes dense Jacobians
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
from tpu3drecon.problems.wtt import BAWTTProblem, WTTBucket, unpermute_cameras
from tpu3drecon.solvers.ba_wtt import _ba_solve_wtt_core
from tpu3drecon.solvers.ba_tt import _tt_state
from tpu3drecon.solvers.bundle_adjust import BAConfig, BAState
from tpu3drecon.solvers.trust_region import TRState

SHARD_AXIS = "shard"


class _WTTView:
    """The fields _ba_solve_wtt_core reads, as device-local shards."""

    def __init__(self, cameras, buckets, avg_cam_width, c_pad):
        self.cameras = cameras
        self.buckets = buckets
        self.avg_cam_width = avg_cam_width
        self.c_pad = c_pad


def _check_divisible(problem: BAWTTProblem, n_devices: int) -> None:
    for b in problem.buckets:
        g = b.uv.shape[0]
        if g % n_devices:
            raise ValueError(
                f"bucket chunk axis {g} not divisible by mesh size "
                f"{n_devices}; rebuild with wtt_from_flat(chunk_multiple="
                f"{n_devices})"
            )


def _bucket_spec(b: WTTBucket, axis_name: str) -> WTTBucket:
    # Static fields (window/global tiles) are aux data in the pytree: the
    # spec pytree must carry the SAME values as the data pytree to match
    # structures.
    chunk = P(axis_name)
    return WTTBucket(
        uv=chunk, mask=chunk, onehot=chunk, cam_base=chunk,
        wcam=None if b.wcam is None else chunk,
        window=b.window,
        global_tiles=b.global_tiles, global_tile0=b.global_tile0,
    )


def shard_wtt_problem(
    problem: BAWTTProblem, mesh: Mesh, axis_name: str = SHARD_AXIS
) -> Tuple[Tuple[WTTBucket, ...], Tuple[jax.Array, ...], CameraParams, jax.Array]:
    """Place a windowed track-table problem on the mesh.

    Returns (buckets, pts_planes, cameras, avg_cam_width) with every bucket
    array sharded on the chunk axis, per-bucket point planes (3, G, Pc)
    sharded on their G axis, and the camera table replicated.
    """
    _check_divisible(problem, mesh.devices.size)
    rep = NamedSharding(mesh, P())
    chunk0 = NamedSharding(mesh, P(axis_name))
    chunk1 = NamedSharding(mesh, P(None, axis_name))
    from tpu3drecon.utils.placement import sharded_put as put

    buckets = tuple(
        WTTBucket(
            uv=put(b.uv, chunk0),
            mask=put(b.mask, chunk0),
            onehot=put(b.onehot, chunk0),
            cam_base=put(b.cam_base, chunk0),
            wcam=None if b.wcam is None else put(b.wcam, chunk0),
            window=b.window,
            global_tiles=b.global_tiles,
            global_tile0=b.global_tile0,
        )
        for b in problem.buckets
    )
    pts = []
    for b, off in zip(problem.buckets, problem.bucket_offsets):
        g, _, tb, pc = b.uv.shape
        block = problem.points3d[off : off + g * pc]
        pts.append(put(jnp.moveaxis(block.reshape(g, pc, 3), 2, 0), chunk1))
    cams = jax.tree_util.tree_map(lambda x: put(x, rep), problem.cameras)
    return buckets, tuple(pts), cams, put(problem.avg_cam_width, rep)


def ba_solve_wtt_sharded(
    problem: BAWTTProblem,
    config: BAConfig = BAConfig(),
    mesh: Optional[Mesh] = None,
    axis_name: Optional[str] = None,
) -> Tuple[CameraParams, jax.Array, BAState]:
    """Sharded windowed track-table BA solve; replicated outputs matching
    ba_solve_wtt (points un-permuted)."""
    if mesh is None:
        from tpu3drecon.parallel.mesh import make_mesh

        mesh = make_mesh(axis_name=axis_name or SHARD_AXIS)
    axis_name = axis_name or mesh.axis_names[0]
    buckets, pts, cams, avg_w = shard_wtt_problem(problem, mesh, axis_name)
    solver = make_sharded_wtt_solver(
        mesh, config, axis_name,
        tuple(
            (b.window, b.global_tiles, b.global_tile0, b.wcam is not None)
            for b in problem.buckets
        ),
        problem.c_pad,
    )
    cameras_out, pts_out, final = solver(buckets, pts, cams, avg_w)
    points3d = jnp.concatenate(
        [jnp.moveaxis(p, 0, 2).reshape(-1, 3) for p in pts_out], axis=0
    )
    pts_full = unpermute_points(points3d, problem)
    cameras_out = unpermute_cameras(cameras_out, problem.cam_rows)
    state = _tt_state(cameras_out, pts_full, final)
    return cameras_out, pts_full, state


_SHARDED_WTT_CACHE: dict = {}


def make_sharded_wtt_solver(
    mesh: Mesh,
    config: BAConfig = BAConfig(),
    axis_name: str = SHARD_AXIS,
    windows: Tuple = (),
    c_pad: int = 128,
):
    """Jitted shard_map wtt solver for a mesh + config (cached).

    ``windows`` carries each bucket's static layout: plain window ints,
    ``(window, global_tiles, global_tile0)`` triples (hub split), or
    quadruples additionally carrying whether the bucket ships the compact
    ``wcam`` index (its spec must mirror the data pytree's structure).
    """
    from tpu3drecon.solvers.bundle_adjust import (
        DynamicBAParams,
        merge_dynamic_config,
        split_dynamic_config,
    )

    defaults = (0, 0, False)  # global_tiles, global_tile0, has_wcam
    statics = tuple(
        (lambda t: t + defaults[len(t) - 1:])(
            w if isinstance(w, tuple) else (w,)
        )
        for w in windows
    )
    static, dyn = split_dynamic_config(config)
    key = (mesh_key(mesh), static, axis_name, statics, c_pad)
    if key in _SHARDED_WTT_CACHE:
        jfn = _SHARDED_WTT_CACHE[key]
        return lambda *a, _j=jfn, _d=dyn: _j(*a, _d)

    rep = P()
    chunk = P(axis_name)
    pts_spec = P(None, axis_name)
    cam_spec = CameraParams(rmats=rep, tvecs=rep, fx_fy=rep, cx_cy_skew=rep, dist=rep)
    in_specs = (
        tuple(
            WTTBucket(
                uv=chunk, mask=chunk, onehot=chunk, cam_base=chunk,
                wcam=chunk if has_wcam else None,
                window=w, global_tiles=gt, global_tile0=g0,
            )
            for (w, gt, g0, has_wcam) in statics
        ),
        tuple(pts_spec for _ in statics),
        cam_spec,
        rep,
    )
    final_spec = TRState(
        params=None, loss=rep, lam=rep, nu=rep, iter_num=rep, accepted=rep,
        grad_norm=rep, converged=rep, cg_iters=rep, gain=rep,
    )
    out_specs = (cam_spec, tuple(pts_spec for _ in statics), final_spec)

    def local(buckets, pts, cams, avg_w, d):
        view = _WTTView(cams, buckets, avg_w, c_pad)
        cameras_out, pts_out, final = _ba_solve_wtt_core(
            view, pts, merge_dynamic_config(static, d), axis_name
        )
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
    _SHARDED_WTT_CACHE[key] = jfn
    return lambda *a, _j=jfn, _d=dyn: _j(*a, _d)
