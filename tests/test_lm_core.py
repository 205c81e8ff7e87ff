"""LM engine tests on classic least-squares problems with known optima.

Replaces the reference's implicit reliance on jaxopt's own test coverage —
our LM is first-party (tpu3drecon/solvers/lm_core.py) so it gets direct
convergence tests against scipy.optimize.least_squares.
"""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import least_squares

from tpu3drecon.solvers.lm_core import LMConfig, lm_solve, lm_solve_batched


def rosenbrock_residuals(p):
    return jnp.array([10.0 * (p[1] - p[0] ** 2), 1.0 - p[0]])


def powell_residuals(p):
    # Powell's badly scaled function.
    return jnp.array([1e4 * p[0] * p[1] - 1.0, jnp.exp(-p[0]) + jnp.exp(-p[1]) - 1.0001])


def linear_residuals(p, a, b):
    return a @ p - b


class TestRosenbrock:
    def test_converges_to_global_minimum(self):
        x0 = jnp.array([-1.2, 1.0])
        x, state = lm_solve(rosenbrock_residuals, x0, config=LMConfig(maxiter=200, gtol=1e-12))
        np.testing.assert_allclose(np.array(x), [1.0, 1.0], atol=1e-8)
        assert bool(state.converged)

    def test_iteration_count_reasonable(self):
        x0 = jnp.array([-1.2, 1.0])
        _, state = lm_solve(rosenbrock_residuals, x0, config=LMConfig(maxiter=200, gtol=1e-12))
        assert int(state.iter_num) < 60


class TestPowell:
    def test_badly_scaled(self):
        x0 = jnp.array([0.0, 1.0])
        x, state = lm_solve(powell_residuals, x0, config=LMConfig(maxiter=200, gtol=1e-14))
        r = np.array(powell_residuals(x))
        np.testing.assert_allclose(r, 0.0, atol=1e-8)


class TestLinear:
    def test_solves_overdetermined_lsq(self, rng):
        a = jnp.array(rng.normal(size=(20, 5)))
        b = jnp.array(rng.normal(size=20))
        x, state = lm_solve(
            linear_residuals, jnp.zeros(5), a, b, config=LMConfig(maxiter=50, gtol=1e-12)
        )
        expected, *_ = np.linalg.lstsq(np.array(a), np.array(b), rcond=None)
        np.testing.assert_allclose(np.array(x), expected, atol=1e-8)

    def test_matches_scipy_least_squares(self, rng):
        a = jnp.array(rng.normal(size=(30, 4)))
        b = jnp.array(rng.normal(size=30))
        x, _ = lm_solve(linear_residuals, jnp.zeros(4), a, b)
        ref = least_squares(
            lambda p: np.array(a) @ p - np.array(b), np.zeros(4), method="lm"
        )
        np.testing.assert_allclose(np.array(x), ref.x, atol=1e-8)


class TestNonlinearCurveFit:
    def test_exponential_fit(self, rng):
        t = jnp.linspace(0, 4, 60)
        true = jnp.array([2.5, 1.3, 0.5])
        y = true[0] * jnp.exp(-true[1] * t) + true[2]

        def res(p):
            return p[0] * jnp.exp(-p[1] * t) + p[2] - y

        x, state = lm_solve(res, jnp.array([1.0, 1.0, 0.0]), config=LMConfig(maxiter=100, gtol=1e-14))
        np.testing.assert_allclose(np.array(x), np.array(true), atol=1e-7)


class TestBatched:
    def test_vmapped_independent_problems(self, rng):
        B = 8
        a = jnp.array(rng.normal(size=(B, 10, 3)))
        b = jnp.array(rng.normal(size=(B, 10)))
        x0 = jnp.zeros((B, 3))
        x, state = lm_solve_batched(linear_residuals, x0, a, b)
        for i in range(B):
            expected, *_ = np.linalg.lstsq(np.array(a[i]), np.array(b[i]), rcond=None)
            np.testing.assert_allclose(np.array(x[i]), expected, atol=1e-7)

    def test_jit_wrapped(self, rng):
        a = jnp.array(rng.normal(size=(10, 3)))
        b = jnp.array(rng.normal(size=10))
        solver = jax.jit(lambda x0: lm_solve(linear_residuals, x0, a, b)[0])
        x = solver(jnp.zeros(3))
        expected, *_ = np.linalg.lstsq(np.array(a), np.array(b), rcond=None)
        np.testing.assert_allclose(np.array(x), expected, atol=1e-7)


class TestRobustness:
    def test_zero_residual_at_start(self):
        # Already at the optimum: must converge immediately, no NaNs.
        def res(p):
            return p - 1.0

        x, state = lm_solve(res, jnp.ones(3))
        np.testing.assert_allclose(np.array(x), 1.0, atol=1e-12)
        assert bool(state.converged)
        assert int(state.iter_num) <= 2

    def test_float32(self, rng):
        a = jnp.array(rng.normal(size=(10, 3)), dtype=jnp.float32)
        b = jnp.array(rng.normal(size=10), dtype=jnp.float32)
        x, state = lm_solve(
            linear_residuals,
            jnp.zeros(3, jnp.float32),
            a,
            b,
            config=LMConfig(gtol=1e-5),
        )
        assert x.dtype == jnp.float32
        expected, *_ = np.linalg.lstsq(np.array(a), np.array(b), rcond=None)
        np.testing.assert_allclose(np.array(x), expected, atol=1e-4)

    def test_retract_manifold_hook(self):
        # Optimize on a circle via a custom retract: params = angle, step in
        # tangent space.
        target = jnp.array([0.0, 1.0])

        def res(theta):
            return jnp.array([jnp.cos(theta[0]), jnp.sin(theta[0])]) - target

        def retract(theta, step):
            return theta + step

        x, _ = lm_solve(res, jnp.array([0.3]), retract=retract)
        np.testing.assert_allclose(float(x[0]) % (2 * np.pi), np.pi / 2, atol=1e-6)
