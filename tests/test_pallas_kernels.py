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


class TestStackedSplitDots:
    """splitdot.py (round 5): the index kernels' bf16 split terms ride ONE
    stacked MXU dot instead of ``terms`` separate passes (measured 1.77x
    on the coupling kernel).  f32-FAITHFULNESS pins: terms=3 must agree
    with the exact f64 path to f32 rounding on the coupling operator;
    terms=1 documents the ~1e-3 single-term ladder (the index1 speed
    mode's operator noise)."""

    @pytest.fixture(scope="class")
    def coupling_inputs(self):
        G, TB, PC, W, NP = 4, 3, 256, 128, 8
        rng = np.random.default_rng(7)
        jc = rng.normal(size=(2 * NP, G, TB, PC))
        jp = rng.normal(size=(6, G, TB, PC))
        v_inv = rng.normal(size=(6, G, PC))
        wcam = rng.integers(0, W, size=(G, TB * PC)).astype(np.int32)
        wcam[rng.random(size=wcam.shape) < 0.1] = -1
        xw = rng.normal(size=(G, NP, W))
        return dict(
            jc=jc, jp=jp, v_inv=v_inv, wcam=wcam, xw=xw,
            dims=(G, TB, PC, W, NP),
        )

    def _rows(self, d, dtype, terms):
        from tpu3drecon.ops.pallas.wtt_matvec import wtt_coupling_rows_idx

        G, TB, PC, W, NP = d["dims"]
        return np.asarray(wtt_coupling_rows_idx(
            jnp.asarray(d["xw"], dtype), jnp.asarray(d["wcam"]),
            jnp.asarray(d["jc"], dtype), jnp.asarray(d["jp"], dtype),
            jnp.asarray(d["v_inv"], dtype), NP, TB, PC, W,
            terms=terms, interpret=True,
        ), dtype=np.float64)

    def test_terms3_is_f32_faithful(self, coupling_inputs):
        exact = self._rows(coupling_inputs, jnp.float64, 3)
        t3 = self._rows(coupling_inputs, jnp.float32, 3)
        scale = np.abs(exact).max()
        assert np.abs(t3 - exact).max() / scale < 5e-6
    def test_terms_ladder(self, coupling_inputs):
        exact = self._rows(coupling_inputs, jnp.float64, 3)
        t1 = self._rows(coupling_inputs, jnp.float32, 1)
        scale = np.abs(exact).max()
        rel1 = np.abs(t1 - exact).max() / scale
        assert 1e-5 < rel1 < 3e-2  # single bf16 term: coarse but usable

    def test_stacked_helpers_fold_order(self):
        """stacked_split_lhs/rhs reproduce the sequential per-term form
        exactly outside Mosaic (pure XLA reassociation-free check)."""
        from tpu3drecon.ops.pallas.splitdot import (
            stacked_split_lhs,
            stacked_split_rhs,
            split_terms,
        )

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(8, 64)), jnp.float32)
        oh = jnp.asarray(
            (rng.random((64, 96)) < 0.02).astype(np.float32)
        ).astype(jnp.bfloat16)
        got = np.asarray(stacked_split_lhs(x, oh, jnp.float32, 3, False))
        # sequential reference
        ref = None
        rem = x
        for _ in range(3):
            h = rem.astype(jnp.bfloat16)
            rem = rem - h.astype(jnp.float32)
            p = jax.lax.dot_general(
                h, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ref = p if ref is None else ref + p
        np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-6)
        data = jnp.asarray(rng.normal(size=(5, 96)), jnp.float32)
        got_r = np.asarray(stacked_split_rhs(oh, data, jnp.float32, 3))
        assert got_r.shape == (64, 5)
        # terms really split: the bf16 concat carries 3 row groups.
        st = split_terms(data, jnp.float32, 3, axis=0)
        assert st.shape == (15, 96)
        # stack=False (the wide-window VMEM fallback, e.g. the hub
        # global tile at W=1664) is the sequential per-term form —
        # f32-faithful agreement with the stacked dot.
        seq_r = np.asarray(stacked_split_rhs(oh, data, jnp.float32, 3, False))
        np.testing.assert_allclose(got_r, seq_r, rtol=1e-6, atol=1e-6)
        exact_r = np.asarray(
            stacked_split_rhs(
                oh, data.astype(jnp.float64), jnp.float64, 3
            )
        )
        np.testing.assert_allclose(seq_r, exact_r, rtol=1e-5, atol=1e-6)
