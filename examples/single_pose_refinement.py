"""Batched single-camera pose (PnP) refinement walkthrough.

Run: python examples/single_pose_refinement.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# TPU3DRECON_CPU=1 forces the CPU backend (this container pre-initializes
# the TPU plugin, so plain JAX_PLATFORMS has no effect — see tests/conftest).
if os.environ.get("TPU3DRECON_CPU") == "1":
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from tpu3drecon.dataset.synthetic import (
        make_scene,
        perturb_scene,
        scene_to_pose_problem,
    )
    from tpu3drecon.geometry.losses import RobustLoss
    from tpu3drecon.solvers.lm_core import LMConfig
    from tpu3drecon.solvers.pose_refine import refine_poses

    scene = make_scene(n_cameras=16, n_points=1000, seed=0)
    noisy = perturb_scene(
        scene, point3d_noise=0.0, camera_rotation_noise=2e-2,
        camera_translation_noise=5e-2, camera_intrinsics_noise=0.0,
        point2d_noise=0.0, seed=1,
    )
    problem, meta = scene_to_pose_problem(noisy, observed=scene, dtype=jnp.float32)
    print(f"{problem.batch} cameras, up to {problem.max_points} points each")

    t0 = time.perf_counter()
    cams, state = refine_poses(
        problem, loss=RobustLoss.CAUCHY, config=LMConfig(maxiter=100, gtol=1e-7)
    )
    print(f"refined in {time.perf_counter()-t0:.2f}s (incl. compile) "
          f"on {jax.default_backend()}")
    t_err = np.linalg.norm(np.asarray(jax.device_get(cams.tvecs)) - scene.tvecs, axis=1)
    print(f"median translation error vs GT: {np.median(t_err):.2e}")
    print("iterations per camera:", np.asarray(jax.device_get(state.iter_num)))


if __name__ == "__main__":
    main()
