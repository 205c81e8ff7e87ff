"""Pallas-backed bundle adjustment: fused-kernel linearization, plane-layout
matvecs, shared trust-region loop.

Per outer iteration:
  1. ops/pallas/cam_normal.py computes r/jp/jc planes + U + g_cam in one
     VMEM pass per camera row;
  2. one XLA track gather moves jp/r rows to the point side;
  3. ops/pallas/point_normal.py fuses V accumulation + damping + closed-form
     inverse + g_pt;
  4. the Schur-CG matvecs run in XLA over the (C, comp, K) *plane layout*
     (lane axis = K everywhere — no tiny-trailing-dim tensors anywhere);
  5. the shared trust-region controller (solvers/trust_region.py) does
     accept/reject — identical control flow to the flat/grid engines, so
     results match them (tests/test_ba_pallas.py).

``interpret=True`` runs the kernels on CPU for tests; compiled mode is the
TPU path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from tpu3drecon.ops.jacobians import apply_se3_retraction
from tpu3drecon.ops.packed_gather import gather_rows_packed, pack_rows, unpack_rows
from tpu3drecon.ops.pallas.cam_normal import cam_normal_fused
from tpu3drecon.ops.pallas.point_normal import point_normal_fused
from tpu3drecon.problems.grid import (
    BAGridBucketedProblem,
    BAGridProblem,
    TrackBucket,
    unpermute_points,
)
from tpu3drecon.problems.packing import CameraParams
from tpu3drecon.solvers.bundle_adjust import BAConfig, BAState
from tpu3drecon.solvers.pcg import cho_block_precond, guarded_block_cholesky, pcg
from tpu3drecon.solvers.trust_region import trust_region_solve

_POINT_BLOCK = 512


def _track_buckets(problem) -> tuple:
    """Normalize: bucketed problems expose their buckets; a plain grid
    problem acts as a single bucket covering all points."""
    if isinstance(problem, BAGridBucketedProblem):
        return problem.buckets
    return (
        TrackBucket(
            track_idx=problem.track_idx,
            track_cam=problem.track_cam,
            track_mask=problem.track_mask,
        ),
    )


class PlaneNormal(NamedTuple):
    """One linearization in plane layout."""

    u_chol: jax.Array  # (C, 8, 8) cholesky of damped U
    u: jax.Array  # (C, 8, 8) damped
    g_cam: jax.Array  # (C, 8)
    g_pt: jax.Array  # (P, 3)
    v_inv: jax.Array  # (P, 3, 3)
    damp_cam: jax.Array  # (C, 8)
    damp_pt: jax.Array  # (P, 3)
    jc: jax.Array  # (C, 16, K) planes
    jp: jax.Array  # (C, 6, K) planes
    jp_g: tuple  # per-bucket (Pb, Tb2, 3) track-gathered


def _linearize(params, lam, problem, config: BAConfig, interpret: bool):
    rmats, tvecs, fx_fy, points3d = params
    c, k = problem.uv.shape[:2]
    p_num = points3d.shape[0]
    dtype = points3d.dtype

    if config.packed_gathers:
        x_w3 = gather_rows_packed(points3d, problem.pt_idx)  # (C,K,3)
    else:
        x_w3 = points3d[problem.pt_idx]
    x_w = jnp.transpose(x_w3, (0, 2, 1))  # (C,3,K)
    uv = jnp.transpose(problem.uv, (0, 2, 1))  # (C,2,K)
    inv_w = (jnp.asarray(1.0, dtype) / problem.avg_cam_width).astype(dtype)

    r, jp, jc, u0, g_cam = cam_normal_fused(
        rmats, tvecs, fx_fy, problem.cameras.cx_cy_skew, problem.cameras.dist,
        x_w, uv, problem.mask, inv_w, loss=config.loss, interpret=interpret,
    )
    if not config.optimize_focal:
        # Zero the focal planes (rows 6, 7, 14, 15) and the matching U/g rows.
        zero_rows = jnp.asarray([6, 7, 14, 15])
        jc = jc.at[:, zero_rows, :].set(0.0)
        keep = jnp.ones((8,), dtype).at[6:8].set(0.0)
        u0 = u0 * keep[None, :, None] * keep[None, None, :]
        g_cam = g_cam * keep[None, :]
    if not config.optimize_points:
        # Pose-only BA: kill the point Jacobian so W (and with it the Schur
        # coupling in every matvec) vanishes, matching the flat/grid engines.
        jp = jp * 0.0

    # Track gather: jp/r rows to the point side, per track-length bucket
    # (bucketing cuts gathered padding rows ~3-4x on skewed distributions).
    jp_rows = jnp.transpose(jp, (0, 2, 1)).reshape(c * k, 6)
    r_rows = jnp.transpose(r, (0, 2, 1)).reshape(c * k, 2)
    # One 8-wide (4 packed) row per obs carries [jp row0 | jp row1 | r].
    jpr_rows = jnp.concatenate([jp_rows, r_rows], axis=1)  # (c*k, 8)
    jpr_packed = pack_rows(jpr_rows) if config.packed_gathers else jpr_rows
    jp_g_buckets = []
    v_inv_parts, g_pt_parts, damp_pt_parts = [], [], []
    for bucket in _track_buckets(problem):
        pb, tb = bucket.track_idx.shape
        tm = bucket.track_mask[..., None]
        if config.packed_gathers:
            jpr_g = unpack_rows(jpr_packed[bucket.track_idx], 8) * tm
        else:
            jpr_g = jpr_packed[bucket.track_idx] * tm
        jp_gb = jpr_g[..., :6].reshape(pb, tb * 2, 3)
        r_gb = jpr_g[..., 6:8].reshape(pb, tb * 2)
        pad = (-pb) % _POINT_BLOCK
        if pad:
            jp_gk = jnp.pad(jp_gb, ((0, pad), (0, 0), (0, 0)))
            r_gk = jnp.pad(r_gb, ((0, pad), (0, 0)))
        else:
            jp_gk, r_gk = jp_gb, r_gb
        vb, gb, db = point_normal_fused(
            jp_gk, r_gk, lam, block_points=_POINT_BLOCK, interpret=interpret
        )
        jp_g_buckets.append(jp_gb)
        v_inv_parts.append(vb[:pb])
        g_pt_parts.append(gb[:pb])
        damp_pt_parts.append(db[:pb])
    v_inv = jnp.concatenate(v_inv_parts)[:p_num]
    g_pt = jnp.concatenate(g_pt_parts)[:p_num]
    damp_pt = jnp.concatenate(damp_pt_parts)[:p_num]
    if not config.optimize_points:
        g_pt = g_pt * 0.0

    eye8 = jnp.eye(8, dtype=dtype)
    du = jnp.clip(jnp.diagonal(u0, axis1=-2, axis2=-1), 1e-8, None)
    damp_cam = lam * du
    u_d = u0 + damp_cam[..., None] * eye8

    if config.precond == "schur_jacobi":
        # Exact S diagonal blocks (see schur.build_normal_blocks), fused in
        # ops/pallas/coupling.py: one 6-wide vinv row gather per
        # linearization (gathers cost per ROW — round-2 rate model), then
        # every W/T intermediate stays in registers.
        from tpu3drecon.ops.pallas.coupling import coupling_fused

        vinv6 = jnp.stack(
            [
                v_inv[:, 0, 0], v_inv[:, 0, 1], v_inv[:, 0, 2],
                v_inv[:, 1, 1], v_inv[:, 1, 2], v_inv[:, 2, 2],
            ],
            axis=1,
        )  # (P, 6)
        vinv6_g = jnp.transpose(vinv6[problem.pt_idx], (0, 2, 1))  # (C,6,K)
        coupling = coupling_fused(jc, jp, vinv6_g, interpret=interpret)
        precond_mat = u_d - coupling
        u_chol = guarded_block_cholesky(precond_mat, u_d)
    else:
        precond_mat = u_d
        u_chol = jax.vmap(jnp.linalg.cholesky)(precond_mat)

    return PlaneNormal(
        u_chol=u_chol, u=u_d, g_cam=g_cam, g_pt=g_pt, v_inv=v_inv,
        damp_cam=damp_cam, damp_pt=damp_pt, jc=jc, jp=jp,
        jp_g=tuple(jp_g_buckets),
    )


def _w_times(
    nb: PlaneNormal, y_pt: jax.Array, problem: BAGridProblem, packed: bool = True
) -> jax.Array:
    """(W y)_c in plane layout: all (C, comp, K) contractions."""
    y_g3 = gather_rows_packed(y_pt, problem.pt_idx) if packed else y_pt[problem.pt_idx]
    y_g = jnp.transpose(y_g3, (0, 2, 1))  # (C,3,K)
    jp0 = nb.jp[:, 0:3, :]
    jp1 = nb.jp[:, 3:6, :]
    tmp0 = jnp.sum(jp0 * y_g, axis=1)  # (C,K) row-0 product
    tmp1 = jnp.sum(jp1 * y_g, axis=1)
    out0 = jnp.einsum("cik,ck->ci", nb.jc[:, :8, :], tmp0)
    out1 = jnp.einsum("cik,ck->ci", nb.jc[:, 8:, :], tmp1)
    return out0 + out1


def _wt_times(
    nb: PlaneNormal, x_cam: jax.Array, problem, packed: bool = True
) -> jax.Array:
    """(W^T x)_p: camera half on planes, point half via the track buckets.

    The per-obs (s0, s1) pair is the natural complex64 payload: packed, the
    track gather moves ONE element per (point, slot) instead of two.
    """
    c, k = problem.uv.shape[:2]
    p_num = problem.points3d.shape[0]
    s0 = jnp.einsum("cik,ci->ck", nb.jc[:, :8, :], x_cam)
    s1 = jnp.einsum("cik,ci->ck", nb.jc[:, 8:, :], x_cam)
    if packed:
        s = jax.lax.complex(s0, s1).reshape(c * k)
    else:
        s = jnp.stack([s0, s1], axis=-1).reshape(c * k, 2)
    parts = []
    for bucket, jp_gb in zip(_track_buckets(problem), nb.jp_g):
        pb, tb = bucket.track_idx.shape
        if packed:
            sg_c = s[bucket.track_idx]  # (Pb, Tb) complex64
            s_g = (
                jnp.stack([jnp.real(sg_c), jnp.imag(sg_c)], axis=-1)
                * bucket.track_mask[..., None]
            ).reshape(pb, tb * 2)
        else:
            s_g = (s[bucket.track_idx] * bucket.track_mask[..., None]).reshape(
                pb, tb * 2
            )
        parts.append(jnp.einsum("pni,pn->pi", jp_gb, s_g))
    out = jnp.concatenate(parts)
    return out[:p_num]


def _schur_matvec(nb, x, problem, packed: bool = True):
    ux = jnp.einsum("cij,cj->ci", nb.u, x)
    wtx = _wt_times(nb, x, problem, packed)
    vinv_wtx = jnp.einsum("pij,pj->pi", nb.v_inv, wtx)
    return ux - _w_times(nb, vinv_wtx, problem, packed)


def _pcg(nb, b, problem, maxiter, rtol, packed: bool = True):
    out = pcg(
        lambda p: _schur_matvec(nb, p, problem, packed),
        cho_block_precond(nb.u_chol),
        b, maxiter, rtol,
    )
    return out.x, out.iters


def _cost(params, problem, config: BAConfig) -> jax.Array:
    """0.5 * ||whitened r||^2 on the grid (plain XLA plane math)."""
    from tpu3drecon.geometry.losses import robust_weight

    rmats, tvecs, fx_fy, points3d = params
    dtype = points3d.dtype
    if config.packed_gathers:
        x_w = gather_rows_packed(points3d, problem.pt_idx)  # (C,K,3)
    else:
        x_w = points3d[problem.pt_idx]
    xc = jnp.einsum("cij,ckj->cki", rmats, x_w) + tvecs[:, None, :]
    z = xc[..., 2]
    iz = 1.0 / jnp.where(jnp.abs(z) < 1e-12, jnp.asarray(1.0, dtype), z)
    fx = fx_fy[:, 0:1]
    fy = fx_fy[:, 1:2]
    ccs = problem.cameras.cx_cy_skew
    dist = problem.cameras.dist
    mx = xc[..., 0] * iz
    my = xc[..., 1] * iz
    rr2 = mx * mx + my * my
    s_rad = 1.0 + dist[:, 0:1] * rr2 + dist[:, 1:2] * rr2 * rr2
    mdx = s_rad * mx
    mdy = s_rad * my
    u = fx * mdx + ccs[:, 2:3] * mdy + ccs[:, 0:1]
    v = fy * mdy + ccs[:, 1:2]
    r = jnp.stack([u, v], axis=-1) - problem.uv
    s = jnp.sum(r * r, axis=-1)
    w = robust_weight(config.loss, jax.lax.stop_gradient(s))
    scale2 = w * (problem.mask / problem.avg_cam_width) ** 2
    return 0.5 * jnp.sum(s * scale2 * jnp.where(problem.mask > 0, 1.0, 0.0))


def ba_solve_pallas(
    problem,
    config: BAConfig = BAConfig(),
    interpret: bool = False,
) -> Tuple[CameraParams, jax.Array, BAState]:
    """Full Pallas-path BA solve; same outputs as ba_solve/ba_solve_grid.

    Accepts BAGridProblem or (faster on skewed track distributions)
    BAGridBucketedProblem — bucketed outputs are un-permuted back to the
    original point order before returning.
    """
    if config.optimize_pp:
        raise ValueError(
            "optimize_pp is supported by the track-table engines "
            "(ba_solve_tt / ba_solve_wtt) only"
        )
    if config.precond in ("tridiag", "ssor"):
        raise ValueError(
            f"precond={config.precond!r} is supported by the tt/wtt engines "
            "only (band preconditioners need the track-table pair one-hots)"
        )
    with jax.default_matmul_precision("highest"):
        cams, pts, state = _ba_solve_pallas_impl(problem, config, interpret)
        if isinstance(problem, BAGridBucketedProblem):
            pts = unpermute_points(pts, problem)
            state = state._replace(points3d=pts)
        return cams, pts, state


def _ba_solve_pallas_impl(problem, config, interpret):
    cams = problem.cameras
    dtype = problem.points3d.dtype
    params0 = (cams.rmats, cams.tvecs, cams.fx_fy, problem.points3d)

    def propose(params, lam):
        nb = _linearize(params, lam, problem, config, interpret)
        grad_norm = jnp.maximum(
            jnp.max(jnp.abs(nb.g_cam)),
            jnp.max(jnp.abs(nb.g_pt)) if config.optimize_points else 0.0,
        )
        packed = config.packed_gathers
        vinv_gp = jnp.einsum("pij,pj->pi", nb.v_inv, nb.g_pt)
        b = -nb.g_cam + _w_times(nb, vinv_gp, problem, packed)
        dc, cg_iters = _pcg(
            nb, b, problem, config.cg_maxiter, config.cg_rtol, packed
        )
        dp = jnp.einsum(
            "pij,pj->pi", nb.v_inv, -nb.g_pt - _wt_times(nb, dc, problem, packed)
        )
        if not config.optimize_points:
            dp = dp * 0.0
        pred = 0.5 * (
            jnp.sum(dc * (nb.damp_cam * dc))
            + jnp.sum(dp * (nb.damp_pt * dp))
            - jnp.sum(dc * nb.g_cam)
            - jnp.sum(dp * nb.g_pt)
        )
        return (dc, dp), grad_norm, pred, cg_iters

    def apply_step(params, delta):
        rmats, tvecs, fx_fy, points3d = params
        dc, dp = delta
        new_r, new_t, new_f = apply_se3_retraction(rmats, tvecs, fx_fy, dc)
        return (new_r, new_t, new_f, points3d + dp)

    cost = functools.partial(_cost, problem=problem, config=config)

    final = trust_region_solve(
        propose, apply_step, cost, params0, config, dtype
    )
    rmats, tvecs, fx_fy, points3d = final.params
    cameras_out = CameraParams(
        rmats=rmats, tvecs=tvecs, fx_fy=fx_fy, cx_cy_skew=cams.cx_cy_skew,
        dist=cams.dist,
    )
    state = BAState(
        rmats=rmats, tvecs=tvecs, fx_fy=fx_fy, points3d=points3d,
        loss=final.loss, lam=final.lam, nu=final.nu, iter_num=final.iter_num,
        accepted=final.accepted, grad_norm=final.grad_norm,
        converged=final.converged, cg_iters=final.cg_iters, gain=final.gain,
    )
    return cameras_out, points3d, state


_PALLAS_SOLVER_CACHE: dict = {}
_PALLAS_JIT_CACHE: dict = {}


def make_pallas_ba_solver(config: BAConfig = BAConfig(), interpret: bool = False):
    key = (config, interpret)
    if key not in _PALLAS_SOLVER_CACHE:
        from tpu3drecon.solvers.bundle_adjust import (
            dynamic_operands,
            merge_dynamic_config,
            static_config,
        )

        static = static_config(config)
        jkey = (static, interpret)
        jfn = _PALLAS_JIT_CACHE.get(jkey)
        if jfn is None:
            jfn = jax.jit(
                lambda p, d, s=static: ba_solve_pallas(
                    p, merge_dynamic_config(s, d), interpret
                )
            )
            _PALLAS_JIT_CACHE[jkey] = jfn
        _PALLAS_SOLVER_CACHE[key] = lambda p, _j=jfn, _c=config: _j(
            p, dynamic_operands(_c)
        )
    return _PALLAS_SOLVER_CACHE[key]
