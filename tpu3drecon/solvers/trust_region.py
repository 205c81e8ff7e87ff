"""Shared trust-region (Levenberg–Marquardt) outer loop.

One ``lax.while_loop`` implementation of the accept/reject + Nielsen damping
control used by every BA engine (flat/grid/pallas).  Engines supply three
callbacks:

  propose(params, lam)   -> (delta, grad_norm, pred_reduction(delta), cg_iters)
  apply(params, delta)   -> candidate params (retraction)
  cost(params)           -> scalar 0.5*||r||^2

``params`` is any pytree (the BA engines use (rmats, tvecs, fx_fy, points)).
Keeping the control flow in one place guarantees the engines are
step-for-step identical — the equality tests in tests/test_ba_grid.py and
tests/test_ba_pallas.py rely on that.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from tpu3drecon.solvers.bundle_adjust import BAConfig


class TRState(NamedTuple):
    params: Any
    loss: jax.Array
    lam: jax.Array
    nu: jax.Array
    iter_num: jax.Array
    accepted: jax.Array
    grad_norm: jax.Array
    converged: jax.Array
    cg_iters: jax.Array
    gain: jax.Array


def trust_region_solve(
    propose: Callable[[Any, jax.Array], Tuple[Any, jax.Array, jax.Array, jax.Array]],
    apply_step: Callable[[Any, Any], Any],
    cost: Callable[[Any], jax.Array],
    params0: Any,
    config: BAConfig,
    dtype,
) -> TRState:
    init = TRState(
        params=params0,
        loss=cost(params0),
        lam=jnp.asarray(config.init_lambda, dtype),
        nu=jnp.asarray(2.0, dtype),
        iter_num=jnp.zeros((), jnp.int32),
        accepted=jnp.zeros((), jnp.int32),
        grad_norm=jnp.asarray(jnp.inf, dtype),
        converged=jnp.zeros((), bool),
        cg_iters=jnp.zeros((), jnp.int32),
        gain=jnp.zeros((), dtype),
    )

    def cond(state: TRState):
        return jnp.logical_and(state.iter_num < config.maxiter, ~state.converged)

    def body(state: TRState):
        delta, grad_norm, pred, cg_iters = propose(state.params, state.lam)
        cand = apply_step(state.params, delta)
        loss_cand = cost(cand)

        pred = jnp.maximum(pred, jnp.asarray(1e-32, dtype))
        gain = (state.loss - loss_cand) / pred
        accept = jnp.logical_and(jnp.isfinite(loss_cand), loss_cand < state.loss)

        lam_acc = state.lam * jnp.maximum(
            jnp.asarray(1.0 / 3.0, dtype), 1.0 - (2.0 * gain - 1.0) ** 3
        )
        lam_new = jnp.clip(
            jnp.where(accept, lam_acc, state.lam * state.nu),
            config.min_lambda,
            config.max_lambda,
        )
        nu_new = jnp.where(accept, jnp.asarray(2.0, dtype), state.nu * 2.0)

        params_new = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), cand, state.params
        )
        rel_decrease = (state.loss - loss_cand) <= config.ftol * jnp.maximum(
            state.loss, jnp.asarray(1e-32, dtype)
        )
        converged = jnp.logical_or(
            grad_norm < config.gtol, jnp.logical_and(accept, rel_decrease)
        )

        return TRState(
            params=params_new,
            loss=jnp.where(accept, loss_cand, state.loss),
            lam=lam_new,
            nu=nu_new,
            iter_num=state.iter_num + 1,
            accepted=state.accepted + accept.astype(jnp.int32),
            grad_norm=grad_norm,
            converged=converged,
            cg_iters=cg_iters,
            gain=gain,
        )

    return jax.lax.while_loop(cond, body, init)
