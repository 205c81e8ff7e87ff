"""Windowed track-table BA problem: the gather-free layout at BAL scale.

The plain track table (problems/tt.py) pays an O(C * slots) one-hot — cheap
at moderate camera counts, impossible at BAL scale (C=1712 would need
~31 GB).  This layout exploits the camera LOCALITY of real capture:
bundle-adjustment tracks are short (mean 2-3) and, on sequential datasets
(BAL's Ladybug et al.), a track's cameras are consecutive ids.  Sorting
points by their minimum observing camera and chunking the point axis makes
each chunk's observations fall inside a narrow camera WINDOW:

  - points are ordered by min observing camera inside each track-length
    bucket (problems/grid.py ``order_points_by_cam``) and split into chunks
    of ``point_chunk`` columns;
  - chunk g stores a window-relative one-hot of shape (W, Tb*Pc) where
    ``W`` is the 128-aligned max window span over chunks — O(W * slots)
    total, independent of C;
  - the camera axis is padded to a multiple of 128 so windows are
    TILE-ALIGNED: the engine (solvers/ba_wtt.py) gathers each chunk's
    (W, d) parameter window and scatter-adds each chunk's (W, d) reductions
    as whole (128, d) tiles — G*W/128 indices total, never per-row.

On camera-local data W stays at 128-512 regardless of C, so the windowed
one-hot is ~W/C of the dense one (e.g. 0.4 GB instead of 31 GB for
Ladybug-1723 at f32).  On camera-DISLOCAL data (synthetic all-see-all) W
degenerates toward C_pad and the layout smoothly becomes the dense tt one.

No reference counterpart: the reference's jaxopt BA materializes dense
Jacobians (src/reconstruction/bundle_adjustment/bundle_adjustment.py:83-91)
and cannot run any of these scales.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu3drecon.problems.grid import grid_bucketed_from_flat
from tpu3drecon.problems.packing import BAProblem, CameraParams

CAM_TILE = 128


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class WTTBucket:
    """One track-length bucket, chunked along the point axis.

    ``G`` chunks of ``Pc`` points each; slot tables are chunk-major with the
    (Tb, Pc) slot axes last.  ``onehot[g, w, n]`` selects window-relative
    camera ``w`` for flat slot ``n = t * Pc + p`` of chunk ``g``;
    ``cam_base[g]`` (a multiple of 128) maps it back to the global camera
    axis.  Padding slots carry all-zero one-hot columns.

    ``window`` is PER BUCKET: short-track buckets are small but camera-wide
    (their few points span the whole trajectory after the camera-local
    sort), so a global window would degenerate to c_pad for everyone; the
    dominant long-track buckets keep their narrow local windows instead.
    """

    uv: jax.Array  # (G, 2, Tb, Pc)
    mask: jax.Array  # (G, Tb, Pc)
    onehot: jax.Array  # (G, W, Tb*Pc) {0,1}
    cam_base: jax.Array  # (G,) int32, multiples of 128
    window: int = dataclasses.field(default=CAM_TILE, metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BAWTTProblem:
    """BA problem in windowed track-table layout.

    Points are permuted into bucket-major (and camera-local) order exactly
    like BAGridBucketedProblem (``point_rows`` maps back; use
    ``tpu3drecon.problems.grid.unpermute_points``).  ``window`` here is the
    MAX over the per-bucket windows (informational); the engine reads each
    bucket's own ``WTTBucket.window``.
    """

    cameras: CameraParams
    points3d: jax.Array  # (P_total, 3) permuted + padded
    buckets: Tuple[WTTBucket, ...]
    avg_cam_width: jax.Array  # ()
    point_rows: jax.Array = None
    n_real_points: int = dataclasses.field(default=0, metadata=dict(static=True))
    bucket_offsets: Tuple[int, ...] = dataclasses.field(
        default=(), metadata=dict(static=True)
    )
    window: int = dataclasses.field(default=CAM_TILE, metadata=dict(static=True))
    c_pad: int = dataclasses.field(default=CAM_TILE, metadata=dict(static=True))

    @property
    def n_cameras(self) -> int:
        return self.cameras.rmats.shape[0]


def _pad_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def wtt_from_flat(
    problem: BAProblem,
    bounds: Tuple[int, ...] = (2, 3, 4, 8),
    point_chunk: int = 512,
    max_onehot_bytes: int = 8 << 30,
    chunk_multiple: int = 1,
) -> BAWTTProblem:
    """Repack a flat BAProblem into the windowed track-table layout.

    ``point_chunk`` is the chunk width Pc (also the point-axis padding
    multiple).  The windows are derived from the data: the max 128-aligned
    camera span of any chunk, per bucket.  Raises ``ValueError`` if the
    windowed one-hots would still exceed ``max_onehot_bytes``.

    ``chunk_multiple`` pads every bucket's chunk count G to a multiple
    (pass the mesh size for the sharded engine, which splits the chunk
    axis across devices: parallel/sharded_wtt.py).  Padding chunks carry
    all-zero masks/one-hots and contribute exact zeros.
    """
    g = grid_bucketed_from_flat(
        problem,
        bounds=bounds,
        point_block=point_chunk * chunk_multiple,
        order_points_by_cam=True,
    )
    guv = np.asarray(jax.device_get(g.uv))
    C, K = guv.shape[:2]
    uv_flat = guv.reshape(C * K, 2)
    np_dtype = uv_flat.dtype
    c_pad = _pad_up(max(C, 1), CAM_TILE)

    # Pass 1: PER-BUCKET window sizes (static; one jit cache entry per
    # (bounds, windows) combination).  Short-track buckets are tiny but
    # camera-wide after the camera-local sort; giving each bucket its own
    # window keeps the dominant long-track buckets narrow.
    windows = []
    host_buckets = []
    onehot_bytes = 0
    for b in g.buckets:
        ti = np.asarray(jax.device_get(b.track_idx))  # (Pb, Tb)
        tc = np.asarray(jax.device_get(b.track_cam))
        tm = np.asarray(jax.device_get(b.track_mask))
        host_buckets.append((ti, tc, tm))
        Pb, Tb = ti.shape
        n_chunks = Pb // point_chunk
        window = CAM_TILE
        for gi in range(n_chunks):
            sl = slice(gi * point_chunk, (gi + 1) * point_chunk)
            cams = tc[sl][tm[sl] > 0]
            if cams.size == 0:
                continue
            base = (int(cams.min()) // CAM_TILE) * CAM_TILE
            span = int(cams.max()) - base + 1
            window = max(window, _pad_up(span, CAM_TILE))
        window = min(window, c_pad)
        windows.append(window)
        onehot_bytes += window * n_chunks * Tb * point_chunk * np_dtype.itemsize

    if onehot_bytes > max_onehot_bytes:
        raise ValueError(
            f"windowed one-hots would be {onehot_bytes / 1e9:.2f} GB "
            f"(windows={windows}); data has too little camera "
            "locality at this scale — use the grid/pallas/sharded engines"
        )

    buckets = []
    offsets = []
    off = 0
    for (ti, tc, tm), window in zip(host_buckets, windows):
        Pb, Tb = ti.shape
        G = Pb // point_chunk
        Pc = point_chunk
        n = Tb * Pc
        uv_b = np.zeros((G, 2, Tb, Pc), np_dtype)
        mask_b = np.zeros((G, Tb, Pc), np_dtype)
        onehot_b = np.zeros((G, window, n), np_dtype)
        cam_base = np.zeros((G,), np.int32)
        for gi in range(G):
            sl = slice(gi * Pc, (gi + 1) * Pc)
            ti_g = ti[sl].T  # (Tb, Pc)
            tc_g = tc[sl].T
            tm_g = tm[sl].T
            uv_b[gi] = np.transpose(uv_flat[ti_g], (2, 0, 1))
            mask_b[gi] = tm_g
            real = tm_g.reshape(n) > 0
            if not real.any():
                continue
            cams = tc_g.reshape(n)[real]
            base = (int(cams.min()) // CAM_TILE) * CAM_TILE
            # The aligned window must cover the span (guaranteed <= W by
            # construction in pass 1); clamp so it stays inside c_pad.
            base = min(base, c_pad - window)
            cam_base[gi] = base
            cols = np.nonzero(real)[0]
            onehot_b[gi, cams - base, cols] = 1.0
        buckets.append(
            WTTBucket(
                uv=jnp.asarray(uv_b),
                mask=jnp.asarray(mask_b),
                onehot=jnp.asarray(onehot_b),
                cam_base=jnp.asarray(cam_base),
                window=window,
            )
        )
        offsets.append(off)
        off += Pb

    return BAWTTProblem(
        cameras=g.cameras,
        points3d=g.points3d,
        buckets=tuple(buckets),
        avg_cam_width=g.avg_cam_width,
        point_rows=g.point_rows,
        n_real_points=g.n_real_points,
        bucket_offsets=tuple(offsets),
        window=max(windows) if windows else CAM_TILE,
        c_pad=c_pad,
    )
