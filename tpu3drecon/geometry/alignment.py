"""Point-set and camera-set alignment (Umeyama, Horn, robust variants).

Array-level rebuild of the reference's CameraSet alignment stack (reference:
src/dataset/camera_pose/camera_set.py:168-340): Horn's quaternion absolute
orientation with scale, the Umeyama SVD solution, and a random-subset robust
wrapper.  Used both as a library feature (aligning reconstructions for
comparison) and by the BA tests to factor out the 7-dof gauge freedom.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class Similarity(NamedTuple):
    """x_target ~= scale * R @ x_source + t."""

    scale: jax.Array  # ()
    rotation: jax.Array  # (3,3)
    translation: jax.Array  # (3,)

    def apply(self, xyz: jax.Array) -> jax.Array:
        return self.scale * (xyz @ self.rotation.T) + self.translation


def umeyama_alignment(
    source: jax.Array, target: jax.Array, with_scale: bool = True
) -> Similarity:
    """Least-squares similarity aligning source -> target (Umeyama 1991).

    Counterpart of CameraSet.compute_pose_matrix (camera_set.py:239-295).
    Pure jnp (jit/grad-safe); SVD sign correction per the original paper.
    """
    mu_s = jnp.mean(source, axis=0)
    mu_t = jnp.mean(target, axis=0)
    xs = source - mu_s
    xt = target - mu_t
    n = source.shape[0]
    cov = (xt.T @ xs) / n
    u, d, vt = jnp.linalg.svd(cov)
    s = jnp.eye(3, dtype=source.dtype)
    det_sign = jnp.sign(jnp.linalg.det(u) * jnp.linalg.det(vt))
    s = s.at[2, 2].set(det_sign)
    rotation = u @ s @ vt
    if with_scale:
        var_s = jnp.mean(jnp.sum(xs * xs, axis=1))
        scale = jnp.sum(d * jnp.diag(s)) / jnp.maximum(var_s, 1e-32)
    else:
        scale = jnp.asarray(1.0, source.dtype)
    translation = mu_t - scale * (rotation @ mu_s)
    return Similarity(scale=scale, rotation=rotation, translation=translation)


def horn_quaternion_alignment(
    source: jax.Array, target: jax.Array, with_scale: bool = True
) -> Similarity:
    """Horn's closed-form absolute orientation via the 4x4 quaternion matrix.

    Counterpart of CameraSet.compute_pose_quaternion (camera_set.py:168-237).
    """
    mu_s = jnp.mean(source, axis=0)
    mu_t = jnp.mean(target, axis=0)
    xs = source - mu_s
    xt = target - mu_t
    m = xs.T @ xt  # 3x3 correlation
    sxx, sxy, sxz = m[0, 0], m[0, 1], m[0, 2]
    syx, syy, syz = m[1, 0], m[1, 1], m[1, 2]
    szx, szy, szz = m[2, 0], m[2, 1], m[2, 2]
    n4 = jnp.array(
        [
            [sxx + syy + szz, syz - szy, szx - sxz, sxy - syx],
            [syz - szy, sxx - syy - szz, sxy + syx, szx + sxz],
            [szx - sxz, sxy + syx, -sxx + syy - szz, syz + szy],
            [sxy - syx, szx + sxz, syz + szy, -sxx - syy + szz],
        ]
    )
    eigvals, eigvecs = jnp.linalg.eigh(n4)
    q = eigvecs[:, -1]  # max eigenvalue -> optimal quaternion (wxyz)
    from tpu3drecon.geometry.rotations import quat_to_matrix

    rotation = quat_to_matrix(q)
    if with_scale:
        num = jnp.sum(xt * (xs @ rotation.T))
        den = jnp.maximum(jnp.sum(xs * xs), 1e-32)
        scale = num / den
    else:
        scale = jnp.asarray(1.0, source.dtype)
    translation = mu_t - scale * (rotation @ mu_s)
    return Similarity(scale=scale, rotation=rotation, translation=translation)


def robust_alignment(
    source: np.ndarray,
    target: np.ndarray,
    n_trials: int = 300,
    subset: Optional[int] = None,
    seed: int = 0,
    with_scale: bool = True,
) -> Similarity:
    """Random-subset robust alignment (host loop).

    Counterpart of CameraSet.compute_robust_pose (camera_set.py:297-340):
    n_trials Umeyama fits on random subsets, keep the transform with the
    lowest median alignment error over all points.
    """
    rng = np.random.default_rng(seed)
    n = len(source)
    # RANSAC-style: minimal samples so that with outlier fraction f the
    # chance of an all-inlier trial (1-f)^subset stays high across n_trials.
    subset = subset or 4
    best: Optional[Similarity] = None
    best_err = np.inf
    src = jnp.asarray(source)
    tgt = jnp.asarray(target)
    for _ in range(n_trials):
        rows = rng.choice(n, size=min(subset, n), replace=False)
        sim = umeyama_alignment(src[rows], tgt[rows], with_scale=with_scale)
        err = float(jnp.median(jnp.linalg.norm(sim.apply(src) - tgt, axis=1)))
        if err < best_err:
            best_err = err
            best = sim
    return best


def alignment_errors(sim: Similarity, source: jax.Array, target: jax.Array):
    """Per-point residual norms after alignment (counterpart of the pairwise
    set-error dicts, camera_set.py:342-396)."""
    return jnp.linalg.norm(sim.apply(source) - target, axis=1)
