"""BAL ("Bundle Adjustment in the Large") problem file I/O.

The standard large-scale BA benchmark format (Agarwal et al., used by Ceres
and every BA paper since): a text file with

    <num_cameras> <num_points> <num_observations>
    <camera_index> <point_index> <x> <y>     x num_observations
    <9 camera params per camera: rodrigues(3), t(3), f, k1, k2>
    <3 coords per point>

The reference has no BAL support (its BASELINE config #5 targets
Ladybug-class problems); this reader packs straight into the flat-observation
BAProblem layout.  Conventions handled: BAL cameras look down -z with
pixel coordinates already centered (principal point 0), so observations are
negated into our +z pinhole convention via a 180-degree rotation about x —
the standard transformation (same one Ceres' examples apply).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from tpu3drecon.problems.packing import BAProblem, CameraParams, ProblemMeta, bucket_size


def read_bal(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Parse a BAL file -> (cam_idx, pt_idx, uv, camera_params(9), points)."""
    opener = open
    if path.endswith(".bz2"):
        import bz2

        opener = bz2.open
    with opener(path, "rt") as f:
        tokens = f.read().split()
    if len(tokens) < 3:
        raise ValueError(f"corrupt BAL file {path!r}: missing header")
    n_cams, n_pts, n_obs = (int(t) for t in tokens[:3])
    expected = 3 + n_obs * 4 + n_cams * 9 + n_pts * 3
    if len(tokens) < expected:
        raise ValueError(
            f"corrupt BAL file {path!r}: header promises {n_cams} cams / "
            f"{n_pts} pts / {n_obs} obs = {expected} tokens, found {len(tokens)}"
        )
    rest = np.array(tokens[3:expected], dtype=np.float64)
    obs_block = rest[: n_obs * 4].reshape(n_obs, 4)
    cam_idx = obs_block[:, 0].astype(np.int32)
    pt_idx = obs_block[:, 1].astype(np.int32)
    uv = obs_block[:, 2:4]
    off = n_obs * 4
    cam_params = rest[off : off + n_cams * 9].reshape(n_cams, 9)
    off += n_cams * 9
    points = rest[off : off + n_pts * 3].reshape(n_pts, 3)
    return cam_idx, pt_idx, uv, cam_params, points


def write_bal(
    path: str,
    cam_idx: np.ndarray,
    pt_idx: np.ndarray,
    uv: np.ndarray,
    cam_params: np.ndarray,
    points: np.ndarray,
) -> None:
    with open(path, "w") as f:
        f.write(f"{len(cam_params)} {len(points)} {len(cam_idx)}\n")
        for k in range(len(cam_idx)):
            f.write(
                f"{int(cam_idx[k])} {int(pt_idx[k])} "
                f"{float(uv[k, 0])!r} {float(uv[k, 1])!r}\n"
            )
        for row in cam_params:
            for v in row:
                f.write(f"{float(v)!r}\n")
        for p in points:
            for v in p:
                f.write(f"{float(v)!r}\n")


def ba_problem_from_bal(
    path: str,
    dtype=None,
    pad_multiple: int = 1024,
) -> Tuple[BAProblem, ProblemMeta]:
    """Load a BAL file as a packed BAProblem.

    BAL's camera frame looks down -z with projection p = -f * [x/z, y/z]
    (Agarwal et al.; see Ceres' snavely_reprojection_error.h).  We conjugate
    the extrinsics with D = diag(1,-1,-1) (R' = D R, t' = D t), which maps the
    u axis exactly (u' = f x'/z' = -f x/z = u_bal) but flips v
    (v' = f y'/z' = +f y/z = -v_bal) — no proper rotation fixes both axes at
    once — so the v observations are negated on load.  Verified against the
    BAL model directly in tests/test_bal.py::test_loader_matches_bal_model.
    Radial distortion coefficients (k1, k2) are carried per camera (BAL
    convention: r(p) = 1 + k1 |p|^2 + k2 |p|^4 on NORMALIZED coordinates) and
    applied by the solver's projection model.
    """
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    cam_idx, pt_idx, uv, cam_params, points = read_bal(path)
    n_cams = len(cam_params)

    from tpu3drecon.geometry.rotations import rodrigues_to_matrix_batch

    rvecs = jnp.asarray(cam_params[:, :3], jnp.float64)
    rmats = np.asarray(rodrigues_to_matrix_batch(rvecs))
    tvecs = cam_params[:, 3:6]
    flip = np.diag([1.0, -1.0, -1.0])
    rmats = np.einsum("ij,cjk->cik", flip, rmats)
    tvecs = tvecs @ flip.T
    focals = cam_params[:, 6]
    uv = uv.copy()
    uv[:, 1] = -uv[:, 1]  # v' = -v_bal (see docstring: D flips u but not v)

    n_obs = len(cam_idx)
    n_pad = bucket_size(max(n_obs, 1), pad_multiple)
    pad = n_pad - n_obs

    problem = BAProblem(
        cameras=CameraParams(
            rmats=jnp.asarray(rmats, dtype),
            tvecs=jnp.asarray(tvecs, dtype),
            fx_fy=jnp.asarray(np.stack([focals, focals], axis=1), dtype),
            cx_cy_skew=jnp.zeros((n_cams, 3), dtype),  # BAL: centered pixels
            dist=jnp.asarray(cam_params[:, 7:9], dtype),  # (k1, k2)
        ),
        points3d=jnp.asarray(points, dtype),
        cam_idx=jnp.asarray(np.concatenate([cam_idx, np.zeros(pad, np.int32)])),
        pt_idx=jnp.asarray(np.concatenate([pt_idx, np.zeros(pad, np.int32)])),
        uv=jnp.asarray(np.concatenate([uv, np.zeros((pad, 2))]), dtype),
        mask=jnp.asarray(np.concatenate([np.ones(n_obs), np.zeros(pad)]), dtype),
        avg_cam_width=jnp.asarray(2.0 * float(np.abs(uv).max() or 1.0), dtype),
    )
    meta = ProblemMeta(
        camera_ids=np.arange(n_cams),
        point_ids=np.arange(len(points)),
        widths=np.full(n_cams, 2.0 * float(np.abs(uv).max() or 1.0)),
        n_real_obs=n_obs,
        distortion=cam_params[:, 7:9],
    )
    return problem, meta
