"""Drop-in compatibility surface for mokrueger/jaxopt-3D-reconstruction users.

Re-exports this framework's components under the reference's public names
and module-level contracts (SURVEY.md §1-2), so a user of the reference can
switch imports wholesale:

    from tpu3drecon.compat import (
        JaxPoseOptimizer, JaxBundleAdjustment, JaxLossFunction,
        Dataset, Camera, CameraPose, CameraSet,
        load_colmap_dataset, export_in_colmap_format,
    )

``JaxPoseOptimizer`` / ``JaxBundleAdjustment`` reproduce the reference
classes' constructor/compile/optimize/prepare_params contracts
(reference: src/reconstruction/bundle_adjustment/pose_optimization.py:55-99,
bundle_adjustment.py:77-129) on top of the first-party LM / implicit-Schur
engines.
"""

from __future__ import annotations

import enum
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---- dataset & IO surface (reference src/dataset) -------------------------

from tpu3drecon.dataset import (  # noqa: F401
    Camera,
    CameraIntrinsics,
    CameraPose,
    CameraSet,
    CoordinateSystem,
    Dataset,
    DatasetEntry,
    ImageMetadata,
    Point2D,
    Point3D,
    PoseFormat,
    TransformationDirection,
    export_in_colmap_format,
    load_colmap_cameras,
    load_colmap_dataset,
)
from tpu3drecon.geometry.losses import RobustLoss, cauchy_loss, l2_loss  # noqa: F401
from tpu3drecon.problems.packing import CameraParams
from tpu3drecon.solvers.bundle_adjust import BAConfig, ba_solve
from tpu3drecon.solvers.lm_core import LMConfig
from tpu3drecon.solvers.pose_refine import PoseRefiner


class JaxLossFunction(enum.Enum):
    """Reference loss.py:17-19 enum, mapped onto RobustLoss."""

    L2 = RobustLoss.TRIVIAL
    CAUCHY = RobustLoss.CAUCHY


class LossFunction(enum.Enum):
    """Reference loss_functions.py:14-17 (CPU evaluation losses)."""

    CAUCHY_LOSS = staticmethod(lambda x: np.log1p(x))
    TRIVIAL_LOSS = staticmethod(lambda x: x)


def to_gpu(data):
    """Reference utils.py:15-18 (device_put; name kept for compat)."""
    if isinstance(data, (list, tuple)):
        return jnp.array([jax.device_put(i) for i in data])
    return jax.device_put(data)


# Reference utils.py function names over our geometry core.
from tpu3drecon.geometry.rotations import (  # noqa: E402
    matrix_to_rodrigues,
    rodrigues_to_matrix,
)


def rot_mat_from_vec(rodrigues_vec):
    """Reference utils.py:21-28 (now theta->0 safe)."""
    return rodrigues_to_matrix(jnp.asarray(rodrigues_vec))


def pose_mat_to_vec(pose):
    """Reference utils.py:31-44: 3x4 or 4x4 pose -> [rodrigues|t]."""
    pose = jnp.asarray(pose)
    return jnp.concatenate([matrix_to_rodrigues(pose[:3, :3]), pose[:3, 3]])


def parse_intrinsics(params, cx_cy_skew):
    """Reference utils.py:47-57."""
    from tpu3drecon.geometry.projection import make_intrinsics_matrix

    return make_intrinsics_matrix(jnp.asarray(params), jnp.asarray(cx_cy_skew))


def parse_cam_pose(cam_vec):
    """Reference utils.py:60-64: [rodrigues|t] -> [R|t]."""
    cam_vec = jnp.asarray(cam_vec)
    return jnp.concatenate(
        [rodrigues_to_matrix(cam_vec[:3]), cam_vec[3:6, None]], axis=1
    )


class JaxPoseOptimizer:
    """Reference JaxPoseOptimizer (pose_optimization.py:55-99) contract.

    Same constructor and method shapes; the LM underneath is the first-party
    engine (scalar reference-parity residual form so convergence behavior
    matches the original's cauchy-of-squares objective).
    """

    def __init__(self, avg_cam_width: float, loss_fn: JaxLossFunction = JaxLossFunction.CAUCHY):
        self._refiner = PoseRefiner(
            avg_cam_width=float(avg_cam_width),
            loss=loss_fn.value,
            residual_form="scalar",
            config=LMConfig(maxiter=100, gtol=1e-7),
        )

    def prepare_params(self, poses0, intrinsics0):
        """[3x4 pose matrices], [5-vector intrinsics] -> (opt_params, cx_cy_skew)
        (reference pose_optimization.py:73-84)."""
        poses0 = jnp.asarray(np.asarray(poses0))
        intrinsics0 = jnp.asarray(np.asarray(intrinsics0))
        fx_fy = intrinsics0[..., :2]
        cx_cy_skew = intrinsics0[..., 2:]
        rvecs = jax.vmap(lambda p: matrix_to_rodrigues(p[:3, :3]))(poses0)
        opt_params = jnp.concatenate([rvecs, poses0[:, :3, 3], fx_fy], axis=1)
        return opt_params, cx_cy_skew

    def optimize(self, opt_params, points, observations, cx_cy_skew, mask):
        params, state = self._refiner.optimize(
            jnp.asarray(opt_params),
            jnp.asarray(points),
            jnp.asarray(observations),
            jnp.asarray(cx_cy_skew),
            jnp.asarray(mask),
        )
        return params, state

    def compile(self, points_num: int, batch_size: int = 8):
        self._refiner.compile(points_num, batch_size)


class JaxBundleAdjustment:
    """Reference JaxBundleAdjustment (bundle_adjustment.py:77-129) contract,
    backed by the implicit-Schur engine (no dense-J size wall)."""

    def __init__(self, cam_num: int, avg_cam_width: float):
        self.cam_num = cam_num
        self.avg_cam_width = float(avg_cam_width)
        self.config = BAConfig(maxiter=100, gtol=1e-6)

    def prepare_params(self, poses0, intrinsics0, points0):
        """Flat [6N | 2N | 3P] parameter vector (reference
        bundle_adjustment.py:93-102)."""
        poses0 = jnp.asarray(np.asarray(poses0))
        intrinsics0 = jnp.asarray(np.asarray(intrinsics0))
        points0 = jnp.asarray(np.asarray(points0))
        fx_fy = intrinsics0[..., :2]
        cx_cy_skew = intrinsics0[..., 2:]
        rvecs = jax.vmap(lambda p: matrix_to_rodrigues(p[:3, :3]))(poses0)
        cam_params = jnp.concatenate([rvecs, poses0[:, :3, 3]], axis=1).ravel()
        opt_params = jnp.concatenate([cam_params, fx_fy.ravel(), points0.ravel()])
        return opt_params, cx_cy_skew

    def optimize(self, opt_params, points_2d_all, p3d_indices_all, cx_cy_skew, masks_all):
        """Solve the packed problem given the reference's (cam, obs)-grid
        arrays; returns (opt_params_out, state)."""
        opt_params = jnp.asarray(opt_params)
        points_2d_all = jnp.asarray(points_2d_all)
        p3d_indices_all = jnp.asarray(p3d_indices_all, jnp.int32)
        cx_cy_skew = jnp.asarray(cx_cy_skew)
        masks_all = jnp.asarray(masks_all)

        n = self.cam_num
        cam_block = opt_params[: n * 6].reshape(n, 6)
        fx_fy = opt_params[n * 6 : n * 8].reshape(n, 2)
        points3d = opt_params[n * 8 :].reshape(-1, 3)
        rmats = jax.vmap(rodrigues_to_matrix)(cam_block[:, :3])

        from tpu3drecon.problems.packing import BAProblem

        obs = points_2d_all.reshape(-1, 2)
        pt_idx = p3d_indices_all.reshape(-1)
        mask = masks_all.reshape(-1)
        cam_idx = jnp.repeat(
            jnp.arange(n, dtype=jnp.int32), points_2d_all.shape[1]
        )
        problem = BAProblem(
            cameras=CameraParams(
                rmats=rmats,
                tvecs=cam_block[:, 3:6],
                fx_fy=fx_fy,
                cx_cy_skew=cx_cy_skew,
                dist=jnp.zeros((n, 2), fx_fy.dtype),  # reference model is pinhole
            ),
            points3d=points3d,
            cam_idx=cam_idx,
            pt_idx=pt_idx,
            uv=obs,
            mask=mask,
            avg_cam_width=jnp.asarray(self.avg_cam_width, obs.dtype),
        )
        cams, pts, state = ba_solve(problem, self.config)
        rvecs_out = jax.vmap(matrix_to_rodrigues)(cams.rmats)
        out = jnp.concatenate(
            [
                jnp.concatenate([rvecs_out, cams.tvecs], axis=1).ravel(),
                cams.fx_fy.ravel(),
                pts.ravel(),
            ]
        )
        return out, state

    def compile(self, points_num: int, indices_num: int):
        """Zeros-shaped warm-up (reference bundle_adjustment.py:122-129)."""
        n = self.cam_num
        self.optimize(
            jnp.concatenate(
                [
                    jnp.tile(jnp.asarray([1e-3, 0, 0, 0, 0, 5.0]), (n,)),
                    jnp.ones(n * 2),
                    jnp.ones(points_num * 3),
                ]
            ),
            jnp.zeros((n, indices_num, 2)),
            jnp.zeros((n, indices_num), dtype=jnp.int32),
            jnp.zeros((n, 3)),
            jnp.zeros((n, indices_num)),
        )


def get_reprojection_residuals_cpu(pose, points, observations, intrinsics, mask):
    """Reference utils.py:6-12: numpy CPU residual oracle (incl. its
    hardcoded /250000 = 500^2 width normalizer)."""
    ke = np.einsum("ij,jk->ik", np.asarray(intrinsics), np.asarray(pose)[:3, :])
    x = np.einsum("ij,hj->hi", ke, np.asarray(points))
    x = x[..., :2] / x[..., 2:3]
    res = ((np.asarray(observations) - x) ** 2).sum(axis=1) / 250000
    return np.where(np.asarray(mask), res, np.zeros_like(res))


from tpu3drecon.utils.multiprocess import ListMultiProcessor  # noqa: E402,F401
from tpu3drecon.benchmark.adapters.output_grabber import OutputGrabber  # noqa: E402,F401
