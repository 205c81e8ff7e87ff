"""Synthetic scene generation with known ground truth.

The reference has no ground-truth generator — its benchmark inputs are real
IMW2020 scenes perturbed by ``Dataset.with_noise`` (reference:
src/dataset/dataset.py:43-98).  Since solver correctness needs a known
optimum, this module synthesizes full scenes (cameras on a ring looking at a
point cloud, realistic pinhole intrinsics), projects exact observations, and
offers the same noise controls as ``with_noise`` (3D point noise, camera
rotation/translation noise, intrinsics noise, 2D observation noise) to create
initializations at a controlled distance from the optimum.

Everything returns packed problems (tpu3drecon.problems.packing) plus the
ground truth, and can also be exported as a ColmapModel for IO round-trips.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from tpu3drecon.io.colmap.records import (
    CameraModelType,
    ColmapCamera,
    ColmapImages,
    ColmapModel,
    ColmapPoints,
)
from tpu3drecon.problems.packing import (
    BAProblem,
    CameraParams,
    PoseProblem,
    ProblemMeta,
    bucket_size,
)
from tpu3drecon.geometry.rotations import matrix_to_quat_batch


@dataclass(frozen=True)
class SyntheticScene:
    """Host-side ground-truth scene."""

    rmats: np.ndarray  # (C, 3, 3) W2C
    tvecs: np.ndarray  # (C, 3) W2C
    fx_fy: np.ndarray  # (C, 2)
    cx_cy_skew: np.ndarray  # (C, 3)
    width: int
    height: int
    points3d: np.ndarray  # (P, 3)
    # Flat observation list (exact projections of points3d).
    cam_idx: np.ndarray  # (N,) int32
    pt_idx: np.ndarray  # (N,) int32
    uv: np.ndarray  # (N, 2)
    dist: Optional[np.ndarray] = None  # (C, 2) radial (k1, k2); None = pinhole

    @property
    def dist_or_zeros(self) -> np.ndarray:
        return self.dist if self.dist is not None else np.zeros((self.n_cameras, 2))

    @property
    def n_cameras(self) -> int:
        return len(self.rmats)

    @property
    def n_points(self) -> int:
        return len(self.points3d)


def _look_at_w2c(center: np.ndarray, target: np.ndarray, up: np.ndarray):
    """W2C extrinsics for a camera at ``center`` looking at ``target``."""
    fwd = target - center
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right = right / np.linalg.norm(right)
    down = np.cross(fwd, right)
    r_c2w = np.stack([right, down, fwd], axis=1)  # columns = camera axes
    rmat = r_c2w.T
    tvec = -rmat @ center
    return rmat, tvec


def make_scene(
    n_cameras: int = 8,
    n_points: int = 500,
    obs_per_camera: Optional[int] = None,
    image_size: Tuple[int, int] = (1280, 960),
    focal: float = 1100.0,
    ring_radius: float = 10.0,
    cloud_radius: float = 2.0,
    seed: int = 0,
    dist: Tuple[float, float] = (0.0, 0.0),
) -> SyntheticScene:
    """Cameras on a ring around a Gaussian point cloud, exact projections.

    Every camera observes ``obs_per_camera`` points (default: all), so every
    point is observed by >= 2 cameras with overwhelming probability; tracks
    below length 2 are culled by the packers exactly as in real data.
    """
    rng = np.random.default_rng(seed)
    w, h = image_size
    points = rng.normal(scale=cloud_radius / 2.0, size=(n_points, 3))
    dist_rows = np.tile(np.asarray(dist, np.float64), (n_cameras, 1))

    rmats = np.zeros((n_cameras, 3, 3))
    tvecs = np.zeros((n_cameras, 3))
    fx_fy = np.zeros((n_cameras, 2))
    cx_cy_skew = np.zeros((n_cameras, 3))
    for c in range(n_cameras):
        angle = 2.0 * np.pi * c / n_cameras
        elev = 0.2 * np.sin(3.0 * angle)
        center = ring_radius * np.array(
            [np.cos(angle), elev, np.sin(angle)]
        ) + rng.normal(scale=0.1, size=3)
        rmats[c], tvecs[c] = _look_at_w2c(
            center, np.zeros(3) + rng.normal(scale=0.05, size=3), np.array([0.0, 1.0, 0.0])
        )
        f = focal * rng.uniform(0.95, 1.05)
        fx_fy[c] = (f, f * rng.uniform(0.99, 1.01))
        cx_cy_skew[c] = (w / 2 + rng.normal(scale=2), h / 2 + rng.normal(scale=2), 0.0)

    cam_chunks, pt_chunks, uv_chunks = [], [], []
    for c in range(n_cameras):
        if obs_per_camera is None or obs_per_camera >= n_points:
            pt_rows = np.arange(n_points)
        elif n_points >= 500_000:
            # BAL-scale fast path: no-replacement sampling is O(n_points) per
            # camera; sample with replacement + dedup instead (collisions are
            # negligible at this ratio).  Gated to huge scenes so benchmark
            # problems at standard sizes remain bit-identical across rounds.
            pt_rows = np.unique(rng.integers(0, n_points, size=obs_per_camera))
        else:
            pt_rows = rng.choice(n_points, size=obs_per_camera, replace=False)
        xyz_cam = points[pt_rows] @ rmats[c].T + tvecs[c]
        in_front = xyz_cam[:, 2] > 0.1
        pt_rows, xyz_cam = pt_rows[in_front], xyz_cam[in_front]
        xy = xyz_cam[:, :2] / xyz_cam[:, 2:3]
        r2 = np.sum(xy * xy, axis=1, keepdims=True)
        xy = (1.0 + dist_rows[c, 0] * r2 + dist_rows[c, 1] * r2 * r2) * xy
        u = fx_fy[c, 0] * xy[:, 0] + cx_cy_skew[c, 2] * xy[:, 1] + cx_cy_skew[c, 0]
        v = fx_fy[c, 1] * xy[:, 1] + cx_cy_skew[c, 1]
        uv = np.stack([u, v], axis=1)
        inside = (u >= 0) & (u < w) & (v >= 0) & (v < h)
        cam_chunks.append(np.full(inside.sum(), c, np.int32))
        pt_chunks.append(pt_rows[inside].astype(np.int32))
        uv_chunks.append(uv[inside])

    return SyntheticScene(
        rmats=rmats,
        tvecs=tvecs,
        fx_fy=fx_fy,
        cx_cy_skew=cx_cy_skew,
        width=w,
        height=h,
        points3d=points,
        cam_idx=np.concatenate(cam_chunks),
        pt_idx=np.concatenate(pt_chunks),
        uv=np.concatenate(uv_chunks),
        dist=dist_rows,
    )


def make_sequential_scene(
    n_cameras: int = 160,
    points_per_camera: int = 30,
    track_span: int = 4,
    image_size: Tuple[int, int] = (1280, 960),
    focal: float = 1100.0,
    spacing: float = 0.5,
    seed: int = 0,
    dist: Tuple[float, float] = (0.0, 0.0),
) -> SyntheticScene:
    """Sequential-capture scene: cameras along a line, camera-LOCAL tracks.

    Models BAL-style trajectories (a vehicle driving past a scene): point
    block ``p`` belongs to camera ``h = p // points_per_camera`` and is
    observed only by cameras ``[h, h + track_span)`` — so camera locality is
    exact and the windowed track-table layout (problems/wtt.py) packs it
    with a window far below the camera count.  Projections are exact (like
    make_scene): solving the perturbed problem must recover GT.
    """
    rng = np.random.default_rng(seed)
    w, h = image_size
    n_points = n_cameras * points_per_camera
    dist_rows = np.tile(np.asarray(dist, np.float64), (n_cameras, 1))

    # Cameras marching along +x, looking at the scene line z=6 ahead.
    rmats = np.zeros((n_cameras, 3, 3))
    tvecs = np.zeros((n_cameras, 3))
    fx_fy = np.zeros((n_cameras, 2))
    cx_cy_skew = np.zeros((n_cameras, 3))
    for c in range(n_cameras):
        center = np.array([spacing * c, 0.0, 0.0]) + rng.normal(scale=0.02, size=3)
        target = np.array([spacing * c + 0.3, 0.0, 6.0]) + rng.normal(
            scale=0.05, size=3
        )
        rmats[c], tvecs[c] = _look_at_w2c(center, target, np.array([0.0, 1.0, 0.0]))
        f = focal * rng.uniform(0.95, 1.05)
        fx_fy[c] = (f, f * rng.uniform(0.99, 1.01))
        cx_cy_skew[c] = (w / 2 + rng.normal(scale=2), h / 2 + rng.normal(scale=2), 0.0)

    # Point block p sits near its home camera's viewing frustum.
    home = np.repeat(np.arange(n_cameras), points_per_camera)
    points = np.stack(
        [
            spacing * home + rng.normal(scale=1.0, size=n_points),
            rng.normal(scale=1.0, size=n_points),
            6.0 + rng.normal(scale=1.0, size=n_points),
        ],
        axis=1,
    )

    cam_chunks, pt_chunks, uv_chunks = [], [], []
    for c in range(n_cameras):
        lo = max(0, (c - track_span + 1)) * points_per_camera
        hi = min(n_cameras, c + 1) * points_per_camera
        pt_rows = np.arange(lo, hi)
        pt_rows = pt_rows[home[pt_rows] + track_span > c]
        xyz_cam = points[pt_rows] @ rmats[c].T + tvecs[c]
        in_front = xyz_cam[:, 2] > 0.1
        pt_rows, xyz_cam = pt_rows[in_front], xyz_cam[in_front]
        xy = xyz_cam[:, :2] / xyz_cam[:, 2:3]
        r2 = np.sum(xy * xy, axis=1, keepdims=True)
        xy = (1.0 + dist_rows[c, 0] * r2 + dist_rows[c, 1] * r2 * r2) * xy
        u = fx_fy[c, 0] * xy[:, 0] + cx_cy_skew[c, 2] * xy[:, 1] + cx_cy_skew[c, 0]
        v = fx_fy[c, 1] * xy[:, 1] + cx_cy_skew[c, 1]
        uv = np.stack([u, v], axis=1)
        inside = (u >= 0) & (u < w) & (v >= 0) & (v < h)
        cam_chunks.append(np.full(inside.sum(), c, np.int32))
        pt_chunks.append(pt_rows[inside].astype(np.int32))
        uv_chunks.append(uv[inside])

    return SyntheticScene(
        rmats=rmats,
        tvecs=tvecs,
        fx_fy=fx_fy,
        cx_cy_skew=cx_cy_skew,
        width=w,
        height=h,
        points3d=points,
        cam_idx=np.concatenate(cam_chunks),
        pt_idx=np.concatenate(pt_chunks),
        uv=np.concatenate(uv_chunks),
        dist=dist_rows,
    )


def make_hub_scene(
    n_cameras: int = 160,
    points_per_camera: int = 30,
    track_span: int = 4,
    hub_fraction: float = 0.05,
    hub_obs: int = 2000,
    image_size: Tuple[int, int] = (1280, 960),
    focal: float = 1100.0,
    spacing: float = 0.5,
    seed: int = 0,
) -> SyntheticScene:
    """Core-periphery (photo-tourism-structured) scene: a sequential local
    backbone PLUS ``hub_fraction`` overview "hub" cameras that each observe
    ``hub_obs`` random points across the WHOLE scene.

    This is the co-visibility structure of landmark photo collections
    (Reichstag/Sacre-Coeur-class scenes the reference targets:
    src/benchmark_implementation/benchmark_datasets.py:30-66): most tracks
    are short and camera-local, but a few popular viewpoints see everything
    — so the camera co-visibility graph has intrinsically high bandwidth
    (hub rows touch every community) and NO single relabeling can make all
    windows narrow.  The wtt packer handles it with the hub/global camera
    split (problems/reorder.plan_hub_camera_order + global window tiles).

    Camera ids are emitted INTERLEAVED (hubs scattered among locals by a
    seeded permutation), photo-tourism style: the packer must discover the
    split itself.  ``hub_camera_rows(...)`` of the returned scene is not
    provided on purpose — tests recover it from the co-visibility degree.

    Geometry: locals march along +x exactly like ``make_sequential_scene``;
    hubs sit far behind the scene line (aerial overview) so the whole point
    cloud is genuinely inside their frustum — projections stay exact.
    """
    rng = np.random.default_rng(seed)
    w, h = image_size
    n_hubs = max(1, int(round(n_cameras * hub_fraction)))
    n_locals = n_cameras - n_hubs
    base = make_sequential_scene(
        n_cameras=n_locals,
        points_per_camera=points_per_camera,
        track_span=track_span,
        image_size=image_size,
        focal=focal,
        spacing=spacing,
        seed=seed,
        dist=(0.0, 0.0),
    )
    n_points = base.n_points

    # Hub cameras: far behind (z << 0), looking at the scene line's middle
    # stretch; distance scales with scene extent so the frustum covers it.
    extent = spacing * n_locals
    hub_r = np.zeros((n_hubs, 3, 3))
    hub_t = np.zeros((n_hubs, 3))
    hub_f = np.zeros((n_hubs, 2))
    hub_c = np.zeros((n_hubs, 3))
    hub_cam, hub_pt, hub_uv = [], [], []
    for j in range(n_hubs):
        cx_pos = extent * (j + 0.5) / n_hubs
        center = np.array([cx_pos, -0.3 * extent, -1.2 * extent])
        target = np.array([extent / 2, 0.0, 6.0]) + rng.normal(scale=0.1, size=3)
        hub_r[j], hub_t[j] = _look_at_w2c(center, target, np.array([0.0, 1.0, 0.0]))
        f = focal * rng.uniform(0.95, 1.05)
        hub_f[j] = (f, f * rng.uniform(0.99, 1.01))
        hub_c[j] = (w / 2 + rng.normal(scale=2), h / 2 + rng.normal(scale=2), 0.0)

        pt_rows = np.unique(rng.integers(0, n_points, size=hub_obs))
        xyz_cam = base.points3d[pt_rows] @ hub_r[j].T + hub_t[j]
        in_front = xyz_cam[:, 2] > 0.1
        pt_rows, xyz_cam = pt_rows[in_front], xyz_cam[in_front]
        xy = xyz_cam[:, :2] / xyz_cam[:, 2:3]
        u = hub_f[j, 0] * xy[:, 0] + hub_c[j, 2] * xy[:, 1] + hub_c[j, 0]
        v = hub_f[j, 1] * xy[:, 1] + hub_c[j, 1]
        inside = (u >= 0) & (u < w) & (v >= 0) & (v < h)
        hub_cam.append(np.full(inside.sum(), n_locals + j, np.int32))
        hub_pt.append(pt_rows[inside].astype(np.int32))
        hub_uv.append(np.stack([u[inside], v[inside]], axis=1))

    # Interleave hub ids among local ids (photo-tourism labeling).
    perm = rng.permutation(n_cameras)  # perm[packed] = emitted id
    inv = np.empty(n_cameras, np.int64)
    inv[perm] = np.arange(n_cameras)

    rmats = np.concatenate([base.rmats, hub_r])[perm]
    tvecs = np.concatenate([base.tvecs, hub_t])[perm]
    fx_fy = np.concatenate([base.fx_fy, hub_f])[perm]
    ccs = np.concatenate([base.cx_cy_skew, hub_c])[perm]
    cam_idx = inv[
        np.concatenate([base.cam_idx] + hub_cam).astype(np.int64)
    ].astype(np.int32)
    return SyntheticScene(
        rmats=rmats,
        tvecs=tvecs,
        fx_fy=fx_fy,
        cx_cy_skew=ccs,
        width=w,
        height=h,
        points3d=base.points3d,
        cam_idx=cam_idx,
        pt_idx=np.concatenate([base.pt_idx] + hub_pt),
        uv=np.concatenate([base.uv] + hub_uv),
        dist=np.zeros((n_cameras, 2)),
    )


def perturb_scene(
    scene: SyntheticScene,
    point3d_noise: float = 3e-2,
    camera_rotation_noise: float = 5e-2,
    camera_translation_noise: float = 5e-2,
    camera_intrinsics_noise: float = 10.0,
    point2d_noise: float = 1.0,
    seed: int = 1,
) -> SyntheticScene:
    """Perturb a scene — the packed-array form of ``Dataset.with_noise``
    (reference dataset.py:43-63): unit-direction noise of fixed magnitude on
    points/poses/intrinsics/observations."""
    rng = np.random.default_rng(seed)

    def unit_rows(n, d):
        v = rng.normal(size=(n, d))
        return v / np.linalg.norm(v, axis=1, keepdims=True)

    points = scene.points3d + unit_rows(scene.n_points, 3) * point3d_noise

    # Rotation noise: left-multiply by a small rotation (reference
    # apply_transform_3d with a random rotvec of magnitude rot_noise).
    from scipy.spatial.transform import Rotation

    dr = Rotation.from_rotvec(unit_rows(scene.n_cameras, 3) * camera_rotation_noise)
    rmats = np.einsum("cij,cjk->cik", dr.as_matrix(), scene.rmats)
    tvecs = (
        np.einsum("cij,cj->ci", dr.as_matrix(), scene.tvecs)
        + unit_rows(scene.n_cameras, 3) * camera_translation_noise
    )
    fx_fy = scene.fx_fy + rng.uniform(0, camera_intrinsics_noise, size=scene.fx_fy.shape)
    uv = scene.uv + unit_rows(len(scene.uv), 2) * point2d_noise

    return replace(
        scene, points3d=points, rmats=rmats, tvecs=tvecs, fx_fy=fx_fy, uv=uv
    )


def scene_to_ba_problem(
    scene: SyntheticScene,
    observed: Optional[SyntheticScene] = None,
    dtype=jnp.float32,
    pad_multiple: int = 1024,
) -> Tuple[BAProblem, ProblemMeta]:
    """Build a packed BA problem: parameters from ``scene`` (typically the
    perturbed initialization), observations from ``observed`` (typically the
    clean ground truth)."""
    obs = observed if observed is not None else scene
    n_obs = len(obs.uv)
    n_pad = bucket_size(max(n_obs, 1), pad_multiple)
    pad = n_pad - n_obs

    problem = BAProblem(
        cameras=CameraParams(
            rmats=jnp.asarray(scene.rmats, dtype),
            tvecs=jnp.asarray(scene.tvecs, dtype),
            fx_fy=jnp.asarray(scene.fx_fy, dtype),
            cx_cy_skew=jnp.asarray(scene.cx_cy_skew, dtype),
            dist=jnp.asarray(scene.dist_or_zeros, dtype),
        ),
        points3d=jnp.asarray(scene.points3d, dtype),
        cam_idx=jnp.asarray(np.concatenate([obs.cam_idx, np.zeros(pad, np.int32)])),
        pt_idx=jnp.asarray(np.concatenate([obs.pt_idx, np.zeros(pad, np.int32)])),
        uv=jnp.asarray(np.concatenate([obs.uv, np.zeros((pad, 2))]), dtype),
        mask=jnp.asarray(np.concatenate([np.ones(n_obs), np.zeros(pad)]), dtype),
        avg_cam_width=jnp.asarray(float(scene.width), dtype),
    )
    meta = ProblemMeta(
        camera_ids=np.arange(1, scene.n_cameras + 1),
        point_ids=np.arange(1, scene.n_points + 1),
        widths=np.full(scene.n_cameras, scene.width),
        n_real_obs=n_obs,
    )
    return problem, meta


def scene_to_pose_problem(
    scene: SyntheticScene,
    observed: Optional[SyntheticScene] = None,
    dtype=jnp.float32,
    pad_multiple: int = 256,
) -> Tuple[PoseProblem, ProblemMeta]:
    """Per-camera PnP problems: 3D points fixed at ``scene`` values,
    observations from ``observed`` (clean), initial poses from ``scene``."""
    obs = observed if observed is not None else scene
    counts = np.bincount(obs.cam_idx, minlength=scene.n_cameras)
    max_n = bucket_size(int(counts.max()), pad_multiple)
    B = scene.n_cameras
    pts3 = np.zeros((B, max_n, 3))
    pts2 = np.zeros((B, max_n, 2))
    mask = np.zeros((B, max_n))
    for c in range(B):
        sel = obs.cam_idx == c
        n = int(sel.sum())
        pts3[c, :n] = scene.points3d[obs.pt_idx[sel]]
        pts2[c, :n] = obs.uv[sel]
        mask[c, :n] = 1.0

    problem = PoseProblem(
        cameras=CameraParams(
            rmats=jnp.asarray(scene.rmats, dtype),
            tvecs=jnp.asarray(scene.tvecs, dtype),
            fx_fy=jnp.asarray(scene.fx_fy, dtype),
            cx_cy_skew=jnp.asarray(scene.cx_cy_skew, dtype),
            dist=jnp.asarray(scene.dist_or_zeros, dtype),
        ),
        points3d=jnp.asarray(pts3, dtype),
        points2d=jnp.asarray(pts2, dtype),
        mask=jnp.asarray(mask, dtype),
        avg_cam_width=jnp.asarray(float(scene.width), dtype),
    )
    meta = ProblemMeta(
        camera_ids=np.arange(1, B + 1),
        point_ids=np.zeros(0, np.int64),
        widths=np.full(B, scene.width),
        n_real_obs=int(counts.sum()),
    )
    return problem, meta


def scene_to_colmap_model(scene: SyntheticScene) -> ColmapModel:
    """Export a synthetic scene as a ColmapModel (for IO round-trip tests and
    baseline adapters that consume COLMAP input)."""
    cameras = {
        c + 1: ColmapCamera(
            camera_id=c + 1,
            model=CameraModelType.PINHOLE,
            width=scene.width,
            height=scene.height,
            params=np.array(
                [
                    scene.fx_fy[c, 0],
                    scene.fx_fy[c, 1],
                    scene.cx_cy_skew[c, 0],
                    scene.cx_cy_skew[c, 1],
                ]
            ),
        )
        for c in range(scene.n_cameras)
    }

    qvecs = np.asarray(matrix_to_quat_batch(jnp.asarray(scene.rmats, jnp.float64)))

    order = np.argsort(scene.cam_idx, kind="stable")
    cam_sorted = scene.cam_idx[order]
    pt_sorted = scene.pt_idx[order]
    uv_sorted = scene.uv[order]
    counts = np.bincount(cam_sorted, minlength=scene.n_cameras)
    offsets = np.zeros(scene.n_cameras + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])

    images = ColmapImages(
        image_ids=np.arange(1, scene.n_cameras + 1, dtype=np.int32),
        qvecs=qvecs,
        tvecs=scene.tvecs.astype(np.float64),
        camera_ids=np.arange(1, scene.n_cameras + 1, dtype=np.int32),
        names=[f"synthetic_{c:04d}.jpg" for c in range(scene.n_cameras)],
        p2d_offsets=offsets,
        p2d_xy=uv_sorted.astype(np.float64),
        p2d_point3d_ids=(pt_sorted + 1).astype(np.int64),
    )

    # Tracks: for each point, the (image_id, p2d_idx) pairs that observe it.
    local_idx = np.zeros(len(cam_sorted), np.int64)
    for c in range(scene.n_cameras):
        s, e = offsets[c], offsets[c + 1]
        local_idx[s:e] = np.arange(e - s)
    porder = np.argsort(pt_sorted, kind="stable")
    p_of = pt_sorted[porder]
    img_of = cam_sorted[porder] + 1
    loc_of = local_idx[porder]
    pcounts = np.bincount(p_of, minlength=scene.n_points)
    poffsets = np.zeros(scene.n_points + 1, np.int64)
    np.cumsum(pcounts, out=poffsets[1:])

    points = ColmapPoints(
        ids=np.arange(1, scene.n_points + 1, dtype=np.int64),
        xyz=scene.points3d.astype(np.float64),
        rgb=np.full((scene.n_points, 3), 128, np.uint8),
        error=np.zeros(scene.n_points),
        track_offsets=poffsets,
        track_image_ids=img_of.astype(np.int32),
        track_p2d_idxs=loc_of.astype(np.int32),
    )
    return ColmapModel(cameras=cameras, images=images, points=points)
