"""Camera reordering for window locality (bandwidth reduction).

The windowed track-table layout (problems/wtt.py) relies on each point
chunk's observing cameras spanning a NARROW window of camera ids.  On
sequential captures the raw ids already have that property; on shuffled or
unstructured (photo-tourism) scenes they do not, and the windows degenerate
toward c_pad — round 2's measured 5.6x cliff (VERDICT.md: wtt 0.132 vs grid
0.738 s/LM-iter at BAL scale).

Camera ids are an arbitrary labeling, so we are free to relabel: reverse
Cuthill-McKee on the camera co-visibility graph (cameras adjacent iff they
observe a common point) minimizes the bandwidth of the camera-camera
coupling structure — which is exactly the quantity the per-chunk windows
pay for.  A shuffled sequential scene recovers its chain ordering exactly;
community-structured photo collections get near-minimal bandwidth.

Host-side, numpy/scipy (packing-time pass, like the rest of problems/).
No reference counterpart: the reference's dense-Jacobian BA has no layout
to optimize (src/reconstruction/bundle_adjustment/bundle_adjustment.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def camera_covisibility(
    cam_idx: np.ndarray,
    pt_idx: np.ndarray,
    n_cameras: int,
    n_points: int,
):
    """Sparse CSR camera-camera co-visibility matrix (counts, symmetric)."""
    import scipy.sparse as sp

    data = np.ones(len(cam_idx), np.float64)
    b = sp.coo_matrix(
        (data, (cam_idx.astype(np.int64), pt_idx.astype(np.int64))),
        shape=(n_cameras, n_points),
    ).tocsr()
    b.data[:] = 1.0  # collapse duplicate (cam, pt) pairs to incidence
    return (b @ b.T).tocsr()


def rcm_camera_order(
    cam_idx: np.ndarray,
    pt_idx: np.ndarray,
    n_cameras: int,
    n_points: int,
) -> np.ndarray:
    """RCM ordering of cameras: ``perm[new] = old`` (a permutation of
    range(n_cameras)).  Cameras sharing tracks end up with close ids."""
    import scipy.sparse.csgraph as csgraph

    adj = camera_covisibility(cam_idx, pt_idx, n_cameras, n_points)
    perm = csgraph.reverse_cuthill_mckee(adj, symmetric_mode=True)
    return np.asarray(perm, np.int64)


def track_span_cost(
    cam_idx: np.ndarray,
    pt_idx: np.ndarray,
    n_points: int,
    relabel: Optional[np.ndarray] = None,
) -> float:
    """Mean per-track camera-id span (the window-width proxy).

    ``relabel[old_cam] = new_cam`` evaluates a candidate ordering without
    repacking anything.  Lower = narrower wtt windows.
    """
    cams = cam_idx if relabel is None else relabel[cam_idx]
    hi = np.full(n_points, -1, np.int64)
    lo = np.full(n_points, np.iinfo(np.int64).max, np.int64)
    np.maximum.at(hi, pt_idx, cams)
    np.minimum.at(lo, pt_idx, cams)
    observed = hi >= 0
    if not observed.any():
        return 0.0
    return float(np.mean(hi[observed] - lo[observed] + 1))


def plan_camera_order(
    cam_idx: np.ndarray,
    pt_idx: np.ndarray,
    mask: np.ndarray,
    n_cameras: int,
    n_points: int,
    min_gain: float = 0.95,
) -> Tuple[Optional[np.ndarray], dict]:
    """Decide whether to relabel cameras; returns (perm or None, stats).

    ``perm[new] = old``; None means the existing order is already within
    ``min_gain`` of the RCM order's span cost (sequential captures land
    here — RCM recovers the chain, the proxy ties, no repack indirection).
    """
    real = np.asarray(mask) > 0
    ci = np.asarray(cam_idx)[real]
    pi = np.asarray(pt_idx)[real]
    base_cost = track_span_cost(ci, pi, n_points)
    try:
        perm = rcm_camera_order(ci, pi, n_cameras, n_points)
    except ImportError:  # scipy absent: keep original order
        return None, {"span_before": base_cost, "span_after": base_cost,
                      "reordered": False, "reason": "scipy unavailable"}
    inv = np.empty(n_cameras, np.int64)
    inv[perm] = np.arange(n_cameras)
    rcm_cost = track_span_cost(ci, pi, n_points, relabel=inv)
    stats = {"span_before": base_cost, "span_after": rcm_cost,
             "reordered": rcm_cost < base_cost * min_gain}
    if not stats["reordered"]:
        return None, stats
    return perm, stats


def permute_cameras_flat(problem, perm: np.ndarray):
    """Relabel cameras of a flat BAProblem by ``perm[new] = old``.

    Host-side numpy pass; returns a new BAProblem whose camera rows and
    cam_idx follow the new labeling.  Callers must map solver camera output
    back with ``perm`` (row new of the solution is camera perm[new]).
    """
    import jax
    import jax.numpy as jnp

    from tpu3drecon.problems.packing import BAProblem, CameraParams

    cams = jax.device_get(problem.cameras)
    inv = np.empty(len(perm), np.int64)
    inv[perm] = np.arange(len(perm))
    cam_idx = np.asarray(jax.device_get(problem.cam_idx))
    new_cameras = CameraParams(
        rmats=jnp.asarray(np.asarray(cams.rmats)[perm]),
        tvecs=jnp.asarray(np.asarray(cams.tvecs)[perm]),
        fx_fy=jnp.asarray(np.asarray(cams.fx_fy)[perm]),
        cx_cy_skew=jnp.asarray(np.asarray(cams.cx_cy_skew)[perm]),
        dist=jnp.asarray(np.asarray(cams.dist)[perm]),
    )
    return BAProblem(
        cameras=new_cameras,
        points3d=problem.points3d,
        cam_idx=jnp.asarray(inv[cam_idx].astype(np.int32)),
        pt_idx=problem.pt_idx,
        uv=problem.uv,
        mask=problem.mask,
        avg_cam_width=problem.avg_cam_width,
    )
