"""Pallas kernel correctness vs the XLA grid engine (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu3drecon.dataset.synthetic import make_scene, perturb_scene, scene_to_ba_problem
from tpu3drecon.geometry.losses import RobustLoss
from tpu3drecon.ops.pallas.cam_normal import cam_normal_fused
from tpu3drecon.problems.grid import grid_from_flat
from tpu3drecon.solvers import ba_grid


@pytest.fixture(scope="module", params=[(0.0, 0.0), (-0.08, 0.012)], ids=["pinhole", "radial"])
def grid(request):
    scene = make_scene(n_cameras=4, n_points=150, seed=61, dist=request.param)
    noisy = perturb_scene(scene, seed=62, point2d_noise=0.0)
    problem, _ = scene_to_ba_problem(noisy, observed=scene, dtype=jnp.float32)
    return grid_from_flat(problem)


def _planes_inputs(grid):
    cams = grid.cameras
    x_w = jnp.transpose(grid.points3d[grid.pt_idx], (0, 2, 1))  # (C,3,K)
    uv = jnp.transpose(grid.uv, (0, 2, 1))  # (C,2,K)
    return cams, x_w, uv


@pytest.mark.parametrize("loss", [RobustLoss.TRIVIAL, RobustLoss.CAUCHY, RobustLoss.HUBER])
def test_cam_normal_matches_grid_engine(grid, loss):
    cams, x_w, uv = _planes_inputs(grid)
    inv_w = jnp.asarray(1.0, jnp.float32) / grid.avg_cam_width

    r_pl, jp_pl, jc_pl, u_pl, g_pl = cam_normal_fused(
        cams.rmats, cams.tvecs, cams.fx_fy, cams.cx_cy_skew, cams.dist,
        x_w, uv, grid.mask, inv_w, loss=loss, interpret=True,
    )

    blocks = ba_grid.grid_blocks(
        cams.rmats, cams.tvecs, cams.fx_fy, cams.cx_cy_skew, cams.dist,
        grid.points3d, grid, loss,
    )
    # Reference U/g from the XLA engine (undamped).
    C, K = grid.uv.shape[:2]
    jc2 = blocks.jc.reshape(C, K * 2, 8)
    r2 = blocks.r.reshape(C, K * 2)
    u_ref = jnp.einsum("cni,cnj->cij", jc2, jc2)
    g_ref = jnp.einsum("cni,cn->ci", jc2, r2)

    np.testing.assert_allclose(
        np.array(r_pl), np.array(jnp.transpose(blocks.r, (0, 2, 1))), atol=1e-5
    )
    jp_ref = jnp.transpose(blocks.jp, (0, 2, 3, 1)).reshape(C, 6, K)
    np.testing.assert_allclose(np.array(jp_pl), np.array(jp_ref), atol=1e-5)
    jc_ref = jnp.transpose(blocks.jc, (0, 2, 3, 1)).reshape(C, 16, K)
    np.testing.assert_allclose(np.array(jc_pl), np.array(jc_ref), atol=1e-5)
    np.testing.assert_allclose(np.array(u_pl), np.array(u_ref), rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.array(g_pl), np.array(g_ref), rtol=2e-4, atol=1e-4)


def test_masked_columns_contribute_zero(grid):
    cams, x_w, uv = _planes_inputs(grid)
    inv_w = jnp.asarray(1.0, jnp.float32) / grid.avg_cam_width
    # Zero the mask entirely: everything must come out exactly 0.
    r_pl, jp_pl, jc_pl, u_pl, g_pl = cam_normal_fused(
        cams.rmats, cams.tvecs, cams.fx_fy, cams.cx_cy_skew, cams.dist,
        x_w, uv, jnp.zeros_like(grid.mask), inv_w, interpret=True,
    )
    assert float(jnp.abs(u_pl).max()) == 0.0
    assert float(jnp.abs(g_pl).max()) == 0.0
    assert float(jnp.abs(r_pl).max()) == 0.0


def test_point_normal_matches_grid_engine(grid):
    from tpu3drecon.ops.pallas.point_normal import point_normal_fused
    from tpu3drecon.solvers.ba_grid import build_grid_normal
    from tpu3drecon.solvers.ba_grid import grid_blocks as gb

    cams = grid.cameras
    lam = jnp.asarray(1e-3, jnp.float32)
    blocks = gb(
        cams.rmats, cams.tvecs, cams.fx_fy, cams.cx_cy_skew, cams.dist,
        grid.points3d, grid, RobustLoss.TRIVIAL,
    )
    nb = build_grid_normal(blocks, grid, lam)

    # Inputs for the kernel: track-gathered jp/r in (P, T2, 3)/(P, T2) form.
    P, T = grid.track_idx.shape
    jp_g = np.array(nb.jp_g).reshape(P, T * 2, 3)
    C, K = grid.uv.shape[:2]
    r_flat = np.array(blocks.r).reshape(C * K, 2)
    r_g = (
        r_flat[np.array(grid.track_idx)]
        * np.array(grid.track_mask)[..., None]
    ).reshape(P, T * 2)

    # Pad P to the block size.
    blk = 64
    pad = (-P) % blk
    jp_g_p = np.pad(jp_g, ((0, pad), (0, 0), (0, 0)))
    r_g_p = np.pad(r_g, ((0, pad), (0, 0)))
    vinv, g_pt, damp = point_normal_fused(
        jnp.asarray(jp_g_p), jnp.asarray(r_g_p), lam,
        block_points=blk, interpret=True,
    )
    np.testing.assert_allclose(np.array(vinv)[:P], np.array(nb.v_inv), rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(np.array(g_pt)[:P], np.array(nb.g_pt), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.array(damp)[:P], np.array(nb.damp_pt), rtol=1e-4, atol=1e-9)
