"""Block-tridiagonal preconditioner (solvers/tridiag.py + tt engine)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu3drecon.dataset.synthetic import (
    make_sequential_scene,
    scene_to_ba_problem,
)
from tpu3drecon.problems.tt import tt_from_flat
from tpu3drecon.solvers.ba_tt import _linearize, _schur_matvec, ba_solve_tt
from tpu3drecon.solvers.bundle_adjust import BAConfig, reprojection_rmse
from tpu3drecon.solvers.tridiag import (
    tridiag_factor,
    tridiag_matvec,
    tridiag_solve,
)


def _random_block_tridiag(rng, C, n, scale=1.0):
    A = rng.normal(size=(C * n, C * n))
    A = A @ A.T + C * n * np.eye(C * n)
    d = np.stack([A[c * n : (c + 1) * n, c * n : (c + 1) * n] for c in range(C)])
    e = np.stack(
        [
            A[c * n : (c + 1) * n, (c + 1) * n : (c + 2) * n] * scale
            if c + 1 < C
            else np.zeros((n, n))
            for c in range(C)
        ]
    )
    M = np.zeros_like(A)
    for c in range(C):
        M[c * n : (c + 1) * n, c * n : (c + 1) * n] = d[c]
        if c + 1 < C:
            M[c * n : (c + 1) * n, (c + 1) * n : (c + 2) * n] = e[c]
            M[(c + 1) * n : (c + 2) * n, c * n : (c + 1) * n] = e[c].T
    return d, e, M


class TestFactorSolve:
    def test_matches_dense_solve(self):
        rng = np.random.default_rng(3)
        d, e, M = _random_block_tridiag(rng, 10, 5)
        r = rng.normal(size=(10, 5))
        f = tridiag_factor(jnp.asarray(d), jnp.asarray(e))
        z = np.asarray(tridiag_solve(f, jnp.asarray(r)))
        z_ref = np.linalg.solve(M, r.reshape(-1)).reshape(10, 5)
        np.testing.assert_allclose(z, z_ref, rtol=1e-10, atol=1e-12)
        mv = np.asarray(
            tridiag_matvec(jnp.asarray(d), jnp.asarray(e), jnp.asarray(r))
        )
        np.testing.assert_allclose(
            mv, (M @ r.reshape(-1)).reshape(10, 5), rtol=1e-10
        )

    def test_indefinite_band_guard(self):
        # The tridiagonal part of an SPD matrix need not be SPD; a blown-up
        # off-diagonal must trip the guard and still give a finite,
        # symmetric-positive apply.
        rng = np.random.default_rng(4)
        d, e, _ = _random_block_tridiag(rng, 8, 4, scale=80.0)
        f = tridiag_factor(jnp.asarray(d), jnp.asarray(e))
        r = rng.normal(size=(8, 4))
        z = np.asarray(tridiag_solve(f, jnp.asarray(r)))
        assert np.isfinite(z).all()
        # The guarded preconditioner is SPD: z . r = r^T M'^-1 r > 0.
        assert float((z * r).sum()) > 0.0


@pytest.fixture(scope="module")
def seq_tt():
    scene = make_sequential_scene(
        n_cameras=16, points_per_camera=24, track_span=3, seed=11
    )
    flat, _ = scene_to_ba_problem(scene, observed=scene, dtype=jnp.float64)
    return flat, tt_from_flat(flat, point_block=64)


class TestTTTridiag:
    def test_offdiag_blocks_exact(self, seq_tt):
        # The pair-one-hot construction must reproduce S_{c,c+1} EXACTLY
        # (probe the true S with basis vectors through the engine matvec).
        flat, tt = seq_tt
        config = BAConfig(precond="tridiag", cg_maxiter=10)
        cams = tt.cameras
        pts_list = tuple(
            tt.points3d[off : off + b.mask.shape[1]].T
            for b, off in zip(tt.buckets, tt.bucket_offsets)
        )
        params = (
            cams.rmats, cams.tvecs, cams.fx_fy, cams.dist, cams.cx_cy_skew,
            pts_list,
        )
        with jax.default_matmul_precision("highest"):
            nb = _linearize(params, jnp.asarray(1e-4), tt, config)
            C = cams.rmats.shape[0]
            n = nb.g_cam.shape[1]
            # Dense S via matvecs on basis vectors.
            eye = jnp.eye(C * n, dtype=nb.g_cam.dtype).reshape(C * n, C, n)
            S = jax.vmap(lambda x: _schur_matvec(nb, x, tt))(eye)
            S = np.asarray(S.reshape(C * n, C * n))
        # Reconstruct E from the factorization: M = L Lt.  E_c = L_c W_c is
        # exact for EVERY interface (w_blocks is computed pre-guard).
        f = nb.tridiag
        l = np.asarray(f.l_blocks)
        w = np.asarray(f.w_blocks)
        w_used = np.asarray(f.w_used)
        for c in range(C - 1):
            e_c = l[c] @ w[c]  # E_c = L_c W_c
            s_block = S[c * n : (c + 1) * n, (c + 1) * n : (c + 2) * n]
            np.testing.assert_allclose(e_c, s_block, rtol=1e-8, atol=1e-12)
        # Diagonal: L_c L_c^T + W_used_c^T W_used_c = S_cc wherever the SPD
        # guard did NOT fire (w_used == w_blocks[c-1]); where it fired the
        # factorization is of the guarded M' with that interface dropped,
        # i.e. L_c L_c^T = S_cc exactly.
        for c in range(C):
            d_c = l[c] @ l[c].T + w_used[c].T @ w_used[c]
            s_block = S[c * n : (c + 1) * n, c * n : (c + 1) * n]
            np.testing.assert_allclose(d_c, s_block, rtol=1e-8, atol=1e-12)

    def test_solve_equals_schur_jacobi_at_convergence(self, seq_tt):
        # Same optimum, and on the sequential scene the tridiag
        # preconditioner must not need MORE CG iterations than the
        # block-diagonal one at a tight tolerance.
        flat, tt = seq_tt
        base = dict(maxiter=12, gtol=0.0, ftol=0.0, cg_maxiter=50,
                    cg_rtol=1e-10)
        cams_a, pts_a, st_a = ba_solve_tt(
            tt, BAConfig(precond="schur_jacobi", **base)
        )
        cams_b, pts_b, st_b = ba_solve_tt(
            tt, BAConfig(precond="tridiag", **base)
        )
        rmse_a = float(reprojection_rmse(flat, cams_a, pts_a))
        rmse_b = float(reprojection_rmse(flat, cams_b, pts_b))
        assert rmse_b < max(2 * rmse_a, 1e-6)
        assert int(st_b.cg_iters) <= int(st_a.cg_iters)

    def test_rejected_by_other_engines(self, seq_tt):
        flat, _ = seq_tt
        from tpu3drecon.solvers.bundle_adjust import ba_solve

        with pytest.raises(ValueError, match="tridiag"):
            ba_solve(flat, BAConfig(precond="tridiag"))


class TestSegmented:
    def test_segmented_matches_block_jacobi_of_segments(self):
        # segments=S must equal the exact solve of the matrix with the
        # boundary interfaces dropped.
        rng = np.random.default_rng(7)
        C, n, S = 12, 4, 3
        d, e, _ = _random_block_tridiag(rng, C, n)
        L = C // S
        e_dropped = e.copy()
        for s in range(S):
            e_dropped[s * L + L - 1] = 0.0
        _, _, M_dropped = _rebuild_dense(d, e_dropped)
        r = rng.normal(size=(C, n))
        f = tridiag_factor(jnp.asarray(d), jnp.asarray(e), segments=S)
        z = np.asarray(tridiag_solve(f, jnp.asarray(r), segments=S))
        z_ref = np.linalg.solve(M_dropped, r.reshape(-1)).reshape(C, n)
        np.testing.assert_allclose(z, z_ref, rtol=1e-9, atol=1e-11)

    def test_auto_segments(self):
        from tpu3drecon.solvers.tridiag import auto_segments

        assert auto_segments(100) == 1
        assert auto_segments(128) == 1  # < 2 segments' worth
        assert auto_segments(256) == 2
        assert auto_segments(1792) == 14
        assert auto_segments(130) == 1  # not divisible


def _rebuild_dense(d, e):
    C, n, _ = d.shape
    M = np.zeros((C * n, C * n))
    for c in range(C):
        M[c * n : (c + 1) * n, c * n : (c + 1) * n] = d[c]
        if c + 1 < C:
            M[c * n : (c + 1) * n, (c + 1) * n : (c + 2) * n] = e[c]
            M[(c + 1) * n : (c + 2) * n, c * n : (c + 1) * n] = e[c].T
    return d, e, M


class TestWTTTridiag:
    @pytest.fixture(scope="class")
    def seq_wtt(self):
        from tpu3drecon.problems.wtt import wtt_from_flat

        scene = make_sequential_scene(
            n_cameras=16, points_per_camera=24, track_span=3, seed=11
        )
        flat, _ = scene_to_ba_problem(scene, observed=scene, dtype=jnp.float64)
        return flat, wtt_from_flat(flat, point_chunk=64)

    def test_wtt_matches_tt_trajectory(self, seq_tt, seq_wtt):
        # Same scene, same tridiag config: the wtt engine's windowed pair
        # one-hot must reproduce the tt engine's E blocks, hence the same
        # trust-region trajectory.
        from tpu3drecon.solvers.ba_wtt import ba_solve_wtt

        flat, tt = seq_tt
        _, wtt = seq_wtt
        config = BAConfig(
            precond="tridiag", maxiter=6, gtol=0.0, ftol=0.0,
            cg_maxiter=30, cg_rtol=1e-10,
        )
        cams_t, pts_t, st_t = ba_solve_tt(tt, config)
        cams_w, pts_w, st_w = ba_solve_wtt(wtt, config)
        np.testing.assert_allclose(
            np.asarray(pts_t), np.asarray(pts_w), rtol=0, atol=1e-9
        )
        assert float(st_t.loss) == pytest.approx(float(st_w.loss), rel=1e-10)

    def test_wtt_tridiag_cg_iters(self, seq_wtt):
        from tpu3drecon.solvers.ba_wtt import ba_solve_wtt

        flat, wtt = seq_wtt
        base = dict(maxiter=12, gtol=0.0, ftol=0.0, cg_maxiter=50,
                    cg_rtol=1e-10)
        cams_a, pts_a, st_a = ba_solve_wtt(
            wtt, BAConfig(precond="schur_jacobi", **base)
        )
        cams_b, pts_b, st_b = ba_solve_wtt(
            wtt, BAConfig(precond="tridiag", **base)
        )
        rmse_a = float(reprojection_rmse(flat, cams_a, pts_a))
        rmse_b = float(reprojection_rmse(flat, cams_b, pts_b))
        assert rmse_b < max(2 * rmse_a, 1e-6)
        assert int(st_b.cg_iters) <= int(st_a.cg_iters)


class TestSSOR:
    """Block-SSOR preconditioner (solvers/tridiag.ssor_*): SPD by
    construction on the same exact D/E band — the scale-robust band option
    (the tridiagonal PART of S is often indefinite at larger camera
    counts; experiments/precond_quality.py)."""

    def test_solve_matches_dense_M(self):
        from tpu3drecon.solvers.tridiag import ssor_factor, ssor_solve

        rng = np.random.default_rng(5)
        C, n = 10, 5
        # Strong off-diagonal: tridiag(E^T, D, E) is indefinite here (6
        # negative modes) but SSOR's M must still be SPD and the solve
        # exact.  (scale=40 makes M itself numerically singular — cond
        # ~1e17 — where no f64 solve agrees with anything; scale=6 keeps
        # the band indefinite at cond(M) ~2e2.)
        d, e, _ = _random_block_tridiag(rng, C, n, scale=6.0)
        Dm = np.zeros((C * n, C * n))
        Lm = np.zeros((C * n, C * n))
        for c in range(C):
            Dm[c * n : (c + 1) * n, c * n : (c + 1) * n] = d[c]
            if c + 1 < C:
                Lm[(c + 1) * n : (c + 2) * n, c * n : (c + 1) * n] = e[c].T
        M = (Dm + Lm) @ np.linalg.solve(Dm, (Dm + Lm).T)
        assert np.linalg.eigvalsh(M).min() > 0.0  # SPD regardless of E

        r = rng.normal(size=(C, n))
        f = ssor_factor(jnp.asarray(d), jnp.asarray(e))
        z = np.asarray(ssor_solve(f, jnp.asarray(r)))
        z_ref = np.linalg.solve(M, r.reshape(-1)).reshape(C, n)
        np.testing.assert_allclose(z, z_ref, rtol=1e-9, atol=1e-11)

    def test_segmented_drops_boundary_interfaces(self):
        from tpu3drecon.solvers.tridiag import ssor_factor, ssor_solve

        rng = np.random.default_rng(6)
        C, n, S = 12, 4, 3
        d, e, _ = _random_block_tridiag(rng, C, n)
        r = rng.normal(size=(C, n))
        f = ssor_factor(jnp.asarray(d), jnp.asarray(e), segments=S)
        z = np.asarray(ssor_solve(f, jnp.asarray(r), segments=S))
        # Reference: per-segment dense SSOR with boundary E zeroed.
        L = C // S
        for s in range(S):
            ds, es = d[s * L : (s + 1) * L], e[s * L : (s + 1) * L].copy()
            es[-1] = 0.0
            Dm = np.zeros((L * n, L * n))
            Lm = np.zeros((L * n, L * n))
            for c in range(L):
                Dm[c * n : (c + 1) * n, c * n : (c + 1) * n] = ds[c]
                if c + 1 < L:
                    Lm[(c + 1) * n : (c + 2) * n, c * n : (c + 1) * n] = es[c].T
            M = (Dm + Lm) @ np.linalg.solve(Dm, (Dm + Lm).T)
            z_ref = np.linalg.solve(
                M, r[s * L : (s + 1) * L].reshape(-1)
            ).reshape(L, n)
            np.testing.assert_allclose(
                z[s * L : (s + 1) * L], z_ref, rtol=1e-9, atol=1e-11
            )

    def test_tt_engine_ssor(self, seq_tt):
        # Same optimum as schur_jacobi; never more CG iterations on the
        # sequential scene.
        flat, tt = seq_tt
        base = dict(maxiter=12, gtol=0.0, ftol=0.0, cg_maxiter=50,
                    cg_rtol=1e-10)
        cams_a, pts_a, st_a = ba_solve_tt(
            tt, BAConfig(precond="schur_jacobi", **base)
        )
        cams_b, pts_b, st_b = ba_solve_tt(
            tt, BAConfig(precond="ssor", **base)
        )
        rmse_a = float(reprojection_rmse(flat, cams_a, pts_a))
        rmse_b = float(reprojection_rmse(flat, cams_b, pts_b))
        assert rmse_b < max(2 * rmse_a, 1e-6)
        assert int(st_b.cg_iters) <= int(st_a.cg_iters)

    def test_wtt_engine_ssor_matches_tt(self, seq_tt):
        from tpu3drecon.problems.wtt import wtt_from_flat
        from tpu3drecon.solvers.ba_wtt import ba_solve_wtt

        flat, tt = seq_tt
        wtt = wtt_from_flat(flat, point_chunk=64)
        config = BAConfig(
            precond="ssor", maxiter=6, gtol=0.0, ftol=0.0,
            cg_maxiter=30, cg_rtol=1e-10,
        )
        cams_t, pts_t, st_t = ba_solve_tt(tt, config)
        cams_w, pts_w, st_w = ba_solve_wtt(wtt, config)
        np.testing.assert_allclose(
            np.asarray(pts_t), np.asarray(pts_w), rtol=0, atol=1e-9
        )
        assert float(st_t.loss) == pytest.approx(float(st_w.loss), rel=1e-10)

    def test_rejected_by_other_engines(self, seq_tt):
        flat, _ = seq_tt
        from tpu3drecon.solvers.bundle_adjust import ba_solve

        with pytest.raises(ValueError, match="ssor"):
            ba_solve(flat, BAConfig(precond="ssor"))
