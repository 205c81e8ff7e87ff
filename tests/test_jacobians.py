"""Analytic Jacobian blocks vs jax.jacfwd AD oracle.

The implicit-Schur BA solver's correctness rests entirely on these blocks,
so they are pinned against forward-mode AD of the same perturbation model —
for both the pinhole and radial-distortion (k1, k2) projection.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from tpu3drecon.geometry.losses import RobustLoss
from tpu3drecon.geometry.rotations import rodrigues_to_matrix
from tpu3drecon.ops.jacobians import apply_se3_retraction, gather_obs_blocks, obs_blocks

PINHOLE = (0.0, 0.0)
RADIAL = (-0.12, 0.02)  # strong but realistic barrel + quartic term


def make_obs(rng, dist=PINHOLE):
    rmat = jnp.array(Rotation.random(random_state=np.random.RandomState(5)).as_matrix())
    tvec = jnp.array(rng.normal(size=3))
    # Make sure the point is in front of the camera.
    xyz_cam = jnp.array([0.3, -0.2, 4.0]) + jnp.array(rng.normal(scale=0.2, size=3))
    xyz = rmat.T @ (xyz_cam - tvec)
    fx_fy = jnp.array([1100.0, 1080.0])
    ccs = jnp.array([640.0, 480.0, 0.3])
    dist = jnp.asarray(dist, jnp.float64)
    uv_true = _project(rmat, tvec, fx_fy, ccs, dist, xyz)
    uv = uv_true + jnp.array(rng.normal(scale=2.0, size=2))
    return rmat, tvec, fx_fy, ccs, dist, xyz, uv


def _project(rmat, tvec, fx_fy, ccs, dist, xyz):
    """Independent projection oracle: perspective divide + polynomial radial."""
    xc = rmat @ xyz + tvec
    m = xc[:2] / xc[2]
    r2 = jnp.dot(m, m)
    md = (1.0 + dist[0] * r2 + dist[1] * r2 * r2) * m
    return jnp.array(
        [
            fx_fy[0] * md[0] + ccs[2] * md[1] + ccs[0],
            fx_fy[1] * md[1] + ccs[1],
        ]
    )


def residual_of_perturbation(rmat, tvec, fx_fy, ccs, dist, xyz, uv, mask, inv_w, loss):
    """r as a function of (cam_delta(8), pt_delta(3)) — the AD oracle for the
    left-multiplicative SE(3) perturbation, with IRLS weight frozen exactly as
    obs_blocks freezes it (weight evaluated at the unperturbed residual)."""

    r0 = _project(rmat, tvec, fx_fy, ccs, dist, xyz) - uv
    s0 = jnp.dot(r0, r0)
    from tpu3drecon.geometry.losses import robust_weight

    w = robust_weight(loss, s0)

    def fn(cam_delta, pt_delta):
        dr = rodrigues_to_matrix(cam_delta[:3])
        new_r = dr @ rmat
        new_t = dr @ tvec + cam_delta[3:6]
        new_f = fx_fy + cam_delta[6:8]
        r = _project(new_r, new_t, new_f, ccs, dist, xyz + pt_delta) - uv
        return r * jnp.sqrt(w) * mask * inv_w

    return fn


@pytest.mark.parametrize("loss", [RobustLoss.TRIVIAL, RobustLoss.CAUCHY])
@pytest.mark.parametrize("dist", [PINHOLE, RADIAL], ids=["pinhole", "radial"])
class TestObsBlocks:
    def test_residual_matches(self, rng, loss, dist):
        rmat, tvec, fx_fy, ccs, dst, xyz, uv = make_obs(rng, dist)
        inv_w = jnp.asarray(1e-3)
        blocks = obs_blocks(
            rmat, tvec, fx_fy, ccs, dst, xyz, uv, jnp.asarray(1.0), inv_w, loss
        )
        oracle = residual_of_perturbation(
            rmat, tvec, fx_fy, ccs, dst, xyz, uv, 1.0, inv_w, loss
        )
        np.testing.assert_allclose(
            np.array(blocks.residual), np.array(oracle(jnp.zeros(8), jnp.zeros(3))), atol=1e-12
        )

    def test_jacobian_blocks_match_ad(self, rng, loss, dist):
        rmat, tvec, fx_fy, ccs, dst, xyz, uv = make_obs(rng, dist)
        inv_w = jnp.asarray(1e-3)
        blocks = obs_blocks(
            rmat, tvec, fx_fy, ccs, dst, xyz, uv, jnp.asarray(1.0), inv_w, loss
        )
        oracle = residual_of_perturbation(
            rmat, tvec, fx_fy, ccs, dst, xyz, uv, 1.0, inv_w, loss
        )
        j_cam_ad = jax.jacfwd(oracle, argnums=0)(jnp.zeros(8), jnp.zeros(3))
        j_pt_ad = jax.jacfwd(oracle, argnums=1)(jnp.zeros(8), jnp.zeros(3))
        np.testing.assert_allclose(np.array(blocks.j_cam), np.array(j_cam_ad), atol=1e-8)
        np.testing.assert_allclose(np.array(blocks.j_pt), np.array(j_pt_ad), atol=1e-8)

    def test_masked_obs_all_zero(self, rng, loss, dist):
        rmat, tvec, fx_fy, ccs, dst, xyz, uv = make_obs(rng, dist)
        blocks = obs_blocks(
            rmat, tvec, fx_fy, ccs, dst, xyz, uv, jnp.asarray(0.0), jnp.asarray(1e-3), loss
        )
        assert np.all(np.array(blocks.residual) == 0)
        assert np.all(np.array(blocks.j_cam) == 0)
        assert np.all(np.array(blocks.j_pt) == 0)


class TestGather:
    def test_matches_single(self, rng):
        C, P, N = 3, 10, 20
        rmats = jnp.array(
            np.stack([Rotation.random(random_state=np.random.RandomState(i)).as_matrix() for i in range(C)])
        )
        tvecs = jnp.array(rng.normal(size=(C, 3)))
        fx_fy = jnp.full((C, 2), 1000.0)
        ccs = jnp.tile(jnp.array([500.0, 400.0, 0.0]), (C, 1))
        dist = jnp.array(rng.normal(scale=0.05, size=(C, 2)))
        # points in front of all cameras: near origin, cameras far away
        pts = jnp.array(rng.normal(scale=0.5, size=(P, 3)))
        tvecs = tvecs.at[:, 2].add(8.0)
        cam_idx = jnp.array(rng.integers(0, C, size=N), dtype=jnp.int32)
        pt_idx = jnp.array(rng.integers(0, P, size=N), dtype=jnp.int32)
        uv = jnp.array(rng.normal(scale=100, size=(N, 2)) + 500)
        mask = jnp.array((rng.random(N) > 0.2).astype(float))
        inv_w = jnp.asarray(1e-3)

        out = gather_obs_blocks(
            rmats, tvecs, fx_fy, ccs, dist, pts, cam_idx, pt_idx, uv, mask, inv_w
        )
        for k in [0, 5, N - 1]:
            single = obs_blocks(
                rmats[cam_idx[k]],
                tvecs[cam_idx[k]],
                fx_fy[cam_idx[k]],
                ccs[cam_idx[k]],
                dist[cam_idx[k]],
                pts[pt_idx[k]],
                uv[k],
                mask[k],
                inv_w,
            )
            np.testing.assert_allclose(np.array(out.residual[k]), np.array(single.residual))
            np.testing.assert_allclose(np.array(out.j_cam[k]), np.array(single.j_cam))
            np.testing.assert_allclose(np.array(out.j_pt[k]), np.array(single.j_pt))


class TestRetraction:
    def test_zero_step_identity(self, rng):
        rmats = jnp.array(Rotation.random(2, random_state=np.random.RandomState(1)).as_matrix())
        tvecs = jnp.array(rng.normal(size=(2, 3)))
        fx_fy = jnp.full((2, 2), 900.0)
        r2, t2, f2 = apply_se3_retraction(rmats, tvecs, fx_fy, jnp.zeros((2, 8)))
        np.testing.assert_allclose(np.array(r2), np.array(rmats), atol=1e-12)
        np.testing.assert_allclose(np.array(t2), np.array(tvecs), atol=1e-12)
        np.testing.assert_allclose(np.array(f2), np.array(fx_fy))

    @pytest.mark.parametrize("dist", [PINHOLE, RADIAL], ids=["pinhole", "radial"])
    def test_retraction_consistent_with_linearization(self, rng, dist):
        # First-order: residual after retraction with small step ~= r + J.step
        rmat, tvec, fx_fy, ccs, dst, xyz, uv = make_obs(rng, dist)
        inv_w = jnp.asarray(1e-3)
        blocks = obs_blocks(rmat, tvec, fx_fy, ccs, dst, xyz, uv, jnp.asarray(1.0), inv_w)
        eps = 1e-6
        step = jnp.array(rng.normal(size=8)) * eps
        r2m, t2m, f2m = apply_se3_retraction(
            rmat[None], tvec[None], fx_fy[None], step[None]
        )
        r_new = obs_blocks(
            r2m[0], t2m[0], f2m[0], ccs, dst, xyz, uv, jnp.asarray(1.0), inv_w
        ).residual
        pred = blocks.residual + blocks.j_cam @ step
        np.testing.assert_allclose(np.array(r_new), np.array(pred), atol=1e-10)
