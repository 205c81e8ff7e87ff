"""Grid-layout BA problem: the TPU fast path.

The flat observation list (BAProblem) accumulates JtJ blocks with
``segment_sum`` — which XLA lowers to scatter-adds, the slowest primitive on
TPU.  This layout removes every scatter from the hot loop:

  - observations live on a dense (C, K) grid (camera-major, padded to K
    observations per camera with masks), so all *per-camera* reductions
    (U blocks, gradients, W-matvec halves) are batched matmuls with the K
    axis as the contraction — MXU work with perfect static shapes;
  - a (P, T) *track table* indexes each point's observations in the
    flattened C*K space, so all *per-point* reductions (V blocks, gradients,
    W^T-matvec halves) are gathers followed by dense reductions over T —
    gathers are fast on TPU, scatters are not.

Padding invariants: padded grid cells carry mask 0 (their whitened blocks
are exact zeros); padded track entries point at flat index 0 and carry their
own 0 in ``track_mask`` (flat cell 0 can be a real observation of another
point, so the track mask is load-bearing).

This is the same restructuring 3DGS-LM/PBA-class systems use for GPU BA
(see PAPERS.md), applied to the TPU memory model.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu3drecon.problems.packing import BAProblem, CameraParams, bucket_size


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BAGridProblem:
    """BA problem in camera-grid + track-table layout."""

    cameras: CameraParams
    points3d: jax.Array  # (P, 3)
    uv: jax.Array  # (C, K, 2)
    pt_idx: jax.Array  # (C, K) int32
    mask: jax.Array  # (C, K)
    track_idx: jax.Array  # (P, T) int32 into flat C*K
    track_cam: jax.Array  # (P, T) int32 camera row of each track entry
    track_mask: jax.Array  # (P, T)
    avg_cam_width: jax.Array  # ()

    @property
    def n_cameras(self) -> int:
        return self.uv.shape[0]

    @property
    def obs_per_camera(self) -> int:
        return self.uv.shape[1]

    @property
    def n_points(self) -> int:
        return self.points3d.shape[0]

    @property
    def max_track(self) -> int:
        return self.track_idx.shape[1]


def grid_from_flat(
    problem: BAProblem,
    obs_pad_multiple: int = 128,
    track_pad_multiple: int = 8,
) -> BAGridProblem:
    """Repack a flat BAProblem into the grid layout (host-side, vectorized)."""
    # One bulk host transfer (per-array pulls through the remote-TPU tunnel
    # are pathologically slow).
    problem = jax.device_get(problem)
    cam_idx = np.asarray(problem.cam_idx)
    pt_idx = np.asarray(problem.pt_idx)
    uv = np.asarray(problem.uv)
    mask = np.asarray(problem.mask)
    real = mask > 0
    cam_idx, pt_idx, uv = cam_idx[real], pt_idx[real], uv[real]

    C = problem.n_cameras
    P = problem.n_points
    counts = np.bincount(cam_idx, minlength=C)
    K = bucket_size(max(int(counts.max()), 1), obs_pad_multiple)

    order = np.argsort(cam_idx, kind="stable")
    cam_sorted = cam_idx[order]
    pt_sorted = pt_idx[order]
    uv_sorted = uv[order]
    starts = np.zeros(C + 1, np.int64)
    np.cumsum(counts, out=starts[1:])

    guv = np.zeros((C, K, 2), uv.dtype)
    gpt = np.zeros((C, K), np.int32)
    gmask = np.zeros((C, K), uv.dtype)
    # Row positions of each sorted obs within its camera row.
    local = np.arange(len(cam_sorted)) - starts[cam_sorted]
    guv[cam_sorted, local] = uv_sorted
    gpt[cam_sorted, local] = pt_sorted
    gmask[cam_sorted, local] = 1.0

    # Track table: flat indices (c * K + k) of each point's observations.
    flat_of_sorted = cam_sorted.astype(np.int64) * K + local
    porder = np.argsort(pt_sorted, kind="stable")
    p_of = pt_sorted[porder]
    flat_of = flat_of_sorted[porder]
    pcounts = np.bincount(p_of, minlength=P)
    T = bucket_size(max(int(pcounts.max()), 1), track_pad_multiple)
    pstarts = np.zeros(P + 1, np.int64)
    np.cumsum(pcounts, out=pstarts[1:])
    plocal = np.arange(len(p_of)) - pstarts[p_of]
    tidx = np.zeros((P, T), np.int32)
    tcam = np.zeros((P, T), np.int32)
    tmask = np.zeros((P, T), uv.dtype)
    tidx[p_of, plocal] = flat_of.astype(np.int32)
    tcam[p_of, plocal] = cam_sorted[porder].astype(np.int32)
    tmask[p_of, plocal] = 1.0

    dtype = problem.uv.dtype
    return BAGridProblem(
        cameras=problem.cameras,
        points3d=problem.points3d,
        uv=jnp.asarray(guv, dtype),
        pt_idx=jnp.asarray(gpt),
        mask=jnp.asarray(gmask, dtype),
        track_idx=jnp.asarray(tidx),
        track_cam=jnp.asarray(tcam),
        track_mask=jnp.asarray(tmask, dtype),
        avg_cam_width=problem.avg_cam_width,
    )
