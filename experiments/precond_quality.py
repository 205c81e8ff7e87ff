"""Offline preconditioner-quality study for the reduced camera system S.

Why tridiag underperforms at scale (measured: 10-64x worse PCG residual
than block-Jacobi at 512-1712 cams despite EXACT D and E blocks): this
script builds a true dense S by probing the wtt Schur matvec at a
mid-scale sequential scene, extracts the engine's own D (schur_jacobi
blocks) and E (S_{c,c+1}) and compares, in f64 numpy PCG:

  - jacobi        M = blockdiag(D)                 (current default)
  - tridiag_guard M = guarded block-cholesky of tridiag(E^T, D, E)
                      (current precond="tridiag", replicated bit-for-bit)
  - tridiag_exact M = tridiag(E^T, D, E) solved densely (what the guard
                      degrades from; indefinite M disqualifies itself)
  - ssor          M = (D+L) D^{-1} (D+L)^T, L = lower band (always SPD)

Prints iteration counts to rtol targets + extreme eigenvalues of the
preconditioned operator.  Decides the round-3 fate of precond="tridiag".

Usage: python experiments/precond_quality.py [n_cams] [lam]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from tpu3drecon.dataset.synthetic import (
    make_sequential_scene,
    perturb_scene,
    scene_to_ba_problem,
)
from tpu3drecon.problems.wtt import wtt_from_flat
from tpu3drecon.solvers import ba_wtt
from tpu3drecon.solvers.bundle_adjust import BAConfig

n_cams = int(sys.argv[1]) if len(sys.argv) > 1 else 128
lam_val = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-3

scene = make_sequential_scene(
    n_cameras=n_cams, points_per_camera=96, track_span=4, seed=7
)
noisy = perturb_scene(scene, seed=8, point2d_noise=0.5)
flat, _ = scene_to_ba_problem(noisy, observed=scene, dtype=jnp.float64)
wtt = wtt_from_flat(flat, point_chunk=256)
config = BAConfig(maxiter=3, cg_maxiter=30, precond="tridiag")

with jax.default_matmul_precision("highest"):
    pts_list = []
    for bucket, off in zip(wtt.buckets, wtt.bucket_offsets):
        g, _, tb, pc = bucket.uv.shape
        block = wtt.points3d[off : off + g * pc]
        pts_list.append(jnp.moveaxis(block.reshape(g, pc, 3), 2, 0))
    cams = wtt.cameras
    params = (cams.rmats, cams.tvecs, cams.fx_fy, cams.dist,
              cams.cx_cy_skew, tuple(pts_list))
    lam = jnp.asarray(lam_val, jnp.float64)
    nb = ba_wtt._linearize(params, lam, wtt, config)

    c_pad = wtt.c_pad
    np_cam = nb.g_cam.shape[1]
    n = c_pad * np_cam

    # Dense S by matvec probing (S is linear; one vmapped call).
    eye = jnp.eye(n, dtype=jnp.float64).reshape(n, c_pad, np_cam)
    smat = jax.jit(
        jax.vmap(lambda x: ba_wtt._schur_matvec(nb, x, wtt, None))
    )
    S = np.asarray(smat(eye).reshape(n, n)).T

# Engine's own blocks.
# D = precond_mat = what u_chol factors; recover it as L L^T.
u_chol = np.asarray(nb.u_chol)
D = np.einsum("cij,ckj->cik", u_chol, u_chol)
E = np.zeros((c_pad, np_cam, np_cam))
f = nb.tridiag
# e_blocks aren't stored; re-derive from true S (they were pinned exact
# in tests/test_tridiag.py, and we verify the band here anyway).
for c in range(c_pad - 1):
    E[c] = S[c * np_cam : (c + 1) * np_cam,
             (c + 1) * np_cam : (c + 2) * np_cam]

# Band mass diagnostics: how much of S lives off the tridiagonal band?
Sb = np.zeros_like(S)
for c in range(c_pad):
    s = slice(c * np_cam, (c + 1) * np_cam)
    Sb[s, s] = D[c]
    if c < c_pad - 1:
        s1 = slice((c + 1) * np_cam, (c + 2) * np_cam)
        Sb[s, s1] = E[c]
        Sb[s1, s] = E[c].T
off_mass = np.linalg.norm(S - Sb) / np.linalg.norm(S)
print(f"cams {n_cams} c_pad {c_pad} lam {lam_val}  "
      f"|S - band| / |S| = {off_mass:.3f}")
M_band = Sb  # tridiag(E^T, D, E) with D = damped schur_jacobi blocks
w_band = np.linalg.eigvalsh(M_band)
print(f"band M eigs: min {w_band.min():.3e} max {w_band.max():.3e} "
      f"(negative -> indefinite: {int((w_band < 0).sum())} modes)")


def pcg_iters(Minv, rtol_targets=(1e-2, 1e-4, 1e-6), maxiter=400):
    rng = np.random.default_rng(0)
    b = rng.standard_normal(n)
    x = np.zeros(n)
    r = b.copy()
    z = Minv(r)
    p = z.copy()
    rz = r @ z
    b_norm = np.linalg.norm(b)
    hits = {}
    for it in range(1, maxiter + 1):
        Ap = S @ p
        alpha = rz / (p @ Ap)
        x += alpha * p
        r -= alpha * Ap
        rn = np.linalg.norm(r) / b_norm
        for t in rtol_targets:
            if t not in hits and rn < t:
                hits[t] = it
        if len(hits) == len(rtol_targets):
            break
        z = Minv(r)
        rz_new = r @ z
        p = z + (rz_new / rz) * p
        rz = rz_new
    return hits, rn


def block_jacobi_inv(r):
    rb = r.reshape(c_pad, np_cam)
    out = np.stack([np.linalg.solve(D[c], rb[c]) for c in range(c_pad)])
    return out.reshape(n)


from tpu3drecon.solvers.tridiag import auto_segments, tridiag_solve

seg = auto_segments(c_pad)


def tridiag_guard_inv(r):
    z = tridiag_solve(f, jnp.asarray(r.reshape(c_pad, np_cam)), segments=seg)
    return np.asarray(z).reshape(n)


Minv_band = np.linalg.inv(M_band)


def tridiag_exact_inv(r):
    return Minv_band @ r


# SSOR: M = (D+L) D^{-1} (D+L)^T with L[c] = E[c-1]^T at block row c.
def ssor_inv(r):
    rb = r.reshape(c_pad, np_cam)
    u = np.zeros_like(rb)
    for c in range(c_pad):
        rhs = rb[c] - (E[c - 1].T @ u[c - 1] if c > 0 else 0.0)
        u[c] = np.linalg.solve(D[c], rhs)
    w = np.einsum("cij,cj->ci", D, u)
    z = np.zeros_like(rb)
    for c in range(c_pad - 1, -1, -1):
        rhs = w[c] - (E[c] @ z[c + 1] if c < c_pad - 1 else 0.0)
        z[c] = np.linalg.solve(D[c], rhs)
    return z.reshape(n)


for name, Minv in (
    ("none", lambda r: r),
    ("jacobi", block_jacobi_inv),
    ("tridiag_guard", tridiag_guard_inv),
    ("tridiag_exact", tridiag_exact_inv),
    ("ssor", ssor_inv),
):
    hits, last = pcg_iters(Minv)
    print(f"{name:>14}: iters to 1e-2/1e-4/1e-6 = "
          f"{hits.get(1e-2, '-'):>4}/{hits.get(1e-4, '-'):>4}/"
          f"{hits.get(1e-6, '-'):>4}  (final rel resid {last:.1e})")

# Guard fire count on this factor (l rebuilt without coupling => w_used 0).
wu = np.asarray(f.w_used)
fired = int(sum(1 for c in range(1, c_pad)
                if np.all(wu[c] == 0.0) and np.any(np.asarray(f.w_blocks)[c - 1] != 0.0)))
print(f"guard fired on {fired}/{c_pad - 1} interfaces")
