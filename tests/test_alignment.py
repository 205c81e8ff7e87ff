"""Direct unit tests for the alignment module (Umeyama / Horn / robust)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from tpu3drecon.geometry.alignment import (
    alignment_errors,
    horn_quaternion_alignment,
    robust_alignment,
    umeyama_alignment,
)


def make_problem(rng, n=50, scale=1.7, noise=0.0):
    src = rng.normal(size=(n, 3))
    rot = Rotation.random(random_state=np.random.RandomState(4)).as_matrix()
    t = np.array([0.5, -2.0, 1.0])
    tgt = scale * (src @ rot.T) + t + rng.normal(scale=noise, size=(n, 3))
    return src, tgt, rot, t, scale


@pytest.mark.parametrize("method", [umeyama_alignment, horn_quaternion_alignment])
class TestClosedForm:
    def test_exact_recovery(self, rng, method):
        src, tgt, rot, t, scale = make_problem(rng)
        sim = method(jnp.asarray(src), jnp.asarray(tgt))
        np.testing.assert_allclose(float(sim.scale), scale, rtol=1e-9)
        np.testing.assert_allclose(np.asarray(sim.rotation), rot, atol=1e-9)
        np.testing.assert_allclose(np.asarray(sim.translation), t, atol=1e-9)

    def test_without_scale(self, rng, method):
        src, tgt, rot, t, scale = make_problem(rng, scale=1.0)
        sim = method(jnp.asarray(src), jnp.asarray(tgt), with_scale=False)
        assert float(sim.scale) == 1.0
        np.testing.assert_allclose(np.asarray(sim.rotation), rot, atol=1e-9)

    def test_noisy_least_squares(self, rng, method):
        src, tgt, rot, t, scale = make_problem(rng, n=500, noise=0.01)
        sim = method(jnp.asarray(src), jnp.asarray(tgt))
        errs = np.asarray(alignment_errors(sim, jnp.asarray(src), jnp.asarray(tgt)))
        assert np.mean(errs) < 0.05
        np.testing.assert_allclose(float(sim.scale), scale, rtol=1e-2)

    def test_reflection_guard(self, rng, method):
        # Degenerate-ish planar data must still return a proper rotation
        # (det +1), not a reflection.
        src = rng.normal(size=(40, 3))
        src[:, 2] *= 1e-6
        rot = Rotation.from_rotvec([0.2, 0.1, 0.3]).as_matrix()
        tgt = src @ rot.T
        sim = method(jnp.asarray(src), jnp.asarray(tgt))
        np.testing.assert_allclose(
            float(jnp.linalg.det(sim.rotation)), 1.0, atol=1e-6
        )


class TestRobust:
    def test_ignores_outliers(self, rng):
        src, tgt, rot, t, scale = make_problem(rng, n=100)
        bad = rng.choice(100, size=20, replace=False)
        tgt_corrupt = tgt.copy()
        tgt_corrupt[bad] += rng.normal(scale=20.0, size=(20, 3))
        sim = robust_alignment(src, tgt_corrupt, n_trials=200, seed=3)
        # Median error over all points should reflect the inlier fit.
        errs = np.asarray(
            alignment_errors(sim, jnp.asarray(src), jnp.asarray(tgt))
        )
        assert np.median(errs) < 1e-6
        np.testing.assert_allclose(float(sim.scale), scale, rtol=1e-6)
