"""MCMC glue + a built-in HMC sampler (reference
``/root/reference/gpflow/optimizers/mcmc.py:49-132``).

``SamplingHelper`` exposes the unconstrained variables as chain state and a
*pure* ``target_log_prob_fn`` (log posterior + forward log-det-Jacobian of the
transforms), directly usable with any JAX sampler (e.g. blackjax).

Since TFP's samplers are not available here, ``run_hmc`` provides a complete
jit-compiled HMC implementation (leapfrog within ``lax.scan``) so HMC/MCMC
workflows are self-contained — the whole chain runs in one device dispatch.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..base import Parameter, functionalize

__all__ = ["SamplingHelper", "run_hmc"]


class SamplingHelper:
    """Bridges Parameter-based models and sample-space MCMC.

    Example::

        helper = SamplingHelper(model.log_posterior_density, model.trainable_parameters)
        samples, log_probs = run_hmc(
            helper.target_log_prob_fn, helper.current_state,
            num_samples=500, num_burnin_steps=300, step_size=0.01,
            key=jax.random.PRNGKey(0))
        constrained = helper.convert_to_constrained_values(samples)
    """

    def __init__(
        self,
        target_log_prob_fn: Callable[[], jax.Array],
        parameters: Sequence[Parameter],
    ) -> None:
        if not all(isinstance(p, Parameter) and p.prior is not None for p in parameters):
            raise ValueError(
                "`parameters` should only contain gpflow_tpu.Parameter objects with priors"
            )
        self._parameters = tuple(parameters)
        self._model_log_prob_fn = target_log_prob_fn

    @property
    def current_state(self) -> Tuple[jax.Array, ...]:
        """Current unconstrained values — the initial chain state."""
        return tuple(p.unconstrained_variable for p in self._parameters)

    @property
    def target_log_prob_fn(self) -> Callable[..., jax.Array]:
        """Pure function of the unconstrained state: log posterior density
        + sum of forward log-det-Jacobians (change of variables to the
        unconstrained space; reference ``mcmc.py:75-114``)."""
        parameters = self._parameters
        model_log_prob_fn = self._model_log_prob_fn

        def _posterior_plus_jacobians() -> jax.Array:
            log_prob = model_log_prob_fn()
            for p in parameters:
                x = p.unconstrained_variable
                log_prob += jnp.sum(p.transform.forward_log_det_jacobian(x))
            return log_prob

        fn = functionalize(_posterior_plus_jacobians, parameters)

        def _target_log_prob_fn(*unconstrained: jax.Array) -> jax.Array:
            return fn(unconstrained)

        return _target_log_prob_fn

    def convert_to_constrained_values(
        self, hmc_samples: Sequence[jax.Array]
    ) -> Sequence[jax.Array]:
        """Maps sampled unconstrained chains back through the transforms
        (reference ``mcmc.py:116-132``)."""
        return [
            p.transform.forward(sample) for sample, p in zip(hmc_samples, self._parameters)
        ]

    def assign_values(self, state: Sequence[jax.Array]) -> None:
        """Writes an (unconstrained) state back into the parameters."""
        for p, v in zip(self._parameters, state):
            p.assign_unconstrained(v)


def run_hmc(
    target_log_prob_fn: Callable[..., jax.Array],
    current_state: Tuple[jax.Array, ...],
    num_samples: int,
    num_burnin_steps: int = 0,
    step_size: float = 0.01,
    num_leapfrog_steps: int = 10,
    key: Optional[jax.Array] = None,
    thin: int = 1,
    adapt_step_size: bool = False,
    target_accept: float = 0.75,
) -> Tuple[Tuple[jax.Array, ...], jax.Array]:
    """Hamiltonian Monte Carlo over a tuple-state target; the full chain is
    one jit-compiled ``lax.scan``. Returns (stacked samples per state leaf,
    log probs [num_samples]).

    ``adapt_step_size=True`` tunes the step size toward ``target_accept``
    during burn-in with dual averaging (Hoffman & Gelman 2014, the same
    role as the reference notebook's ``tfp.mcmc.SimpleStepSizeAdaptation``,
    ``doc/sphinx/notebooks/advanced/mcmc.pct.py``) and freezes the averaged
    step for the sampling phase.
    """
    if key is None:
        key = jax.random.PRNGKey(0)

    state = tuple(jnp.asarray(s) for s in current_state)
    logp_fn = lambda st: target_log_prob_fn(*st)
    grad_fn = jax.grad(lambda st: logp_fn(st))
    f_dtype = jnp.asarray(logp_fn(state)).dtype

    def leapfrog(q, p, step):
        g = grad_fn(q)
        p = tuple(pi + 0.5 * step * gi for pi, gi in zip(p, g))
        for _ in range(num_leapfrog_steps - 1):
            q = tuple(qi + step * pi for qi, pi in zip(q, p))
            g = grad_fn(q)
            p = tuple(pi + step * gi for pi, gi in zip(p, g))
        q = tuple(qi + step * pi for qi, pi in zip(q, p))
        g = grad_fn(q)
        p = tuple(pi + 0.5 * step * gi for pi, gi in zip(p, g))
        return q, p

    # dual-averaging constants (Hoffman & Gelman 2014, Algorithm 5)
    da_mu = jnp.log(10.0 * step_size)
    da_gamma, da_t0, da_kappa = 0.05, 10.0, 0.75

    def hmc_step(carry, inputs):
        q, logp, log_step, log_step_avg, h_stat = carry
        key_i, t = inputs  # t: 1-based step index within burn-in, 0 after
        k_mom, k_acc = jax.random.split(key_i)
        keys = jax.random.split(k_mom, len(q))
        p0 = tuple(
            jax.random.normal(k, qi.shape, qi.dtype) for k, qi in zip(keys, q)
        )
        # Select the effective step at USE time: during burn-in the raw
        # dual-averaging iterate, after it the frozen average — including
        # for the FIRST post-burn-in step (the carry's log_step still holds
        # the last raw iterate at that point; round-2 review).
        if adapt_step_size:
            step = jnp.exp(jnp.where(t > 0, log_step, log_step_avg))
        else:
            step = jnp.exp(log_step)
        q_new, p_new = leapfrog(q, p0, step)
        logp_new = logp_fn(q_new)
        kinetic0 = sum(0.5 * jnp.sum(jnp.square(pi)) for pi in p0)
        kinetic1 = sum(0.5 * jnp.sum(jnp.square(pi)) for pi in p_new)
        log_accept = (logp_new - kinetic1) - (logp - kinetic0)
        # a diverged trajectory (NaN energy) must count as rejected
        log_accept = jnp.where(jnp.isfinite(log_accept), log_accept, -jnp.inf)
        accept = jnp.log(jax.random.uniform(k_acc, (), logp.dtype)) < log_accept
        q_out = tuple(jnp.where(accept, qn, qo) for qn, qo in zip(q_new, q))
        logp_out = jnp.where(accept, logp_new, logp)

        if adapt_step_size:
            accept_prob = jnp.minimum(1.0, jnp.exp(log_accept))
            in_burnin = t > 0
            tf = jnp.maximum(t.astype(f_dtype), 1.0)
            eta = 1.0 / (tf + da_t0)
            h_new = (1.0 - eta) * h_stat + eta * (target_accept - accept_prob)
            log_step_new = da_mu - jnp.sqrt(tf) / da_gamma * h_new
            w = tf ** (-da_kappa)
            log_avg_new = w * log_step_new + (1.0 - w) * log_step_avg
            h_stat = jnp.where(in_burnin, h_new, h_stat)
            log_step_avg = jnp.where(in_burnin, log_avg_new, log_step_avg)
            log_step = jnp.where(in_burnin, log_step_new, log_step)

        carry = (q_out, logp_out, log_step, log_step_avg, h_stat)
        return carry, (q_out, logp_out)

    total = num_burnin_steps + num_samples * thin
    keys = jax.random.split(key, total)
    # step index: 1..num_burnin during burn-in, 0 afterwards (no adaptation)
    t_idx = jnp.where(
        jnp.arange(total) < num_burnin_steps, jnp.arange(total) + 1, 0
    )
    log_step0 = jnp.asarray(jnp.log(step_size), f_dtype)
    init = (state, logp_fn(state), log_step0, log_step0, jnp.asarray(0.0, f_dtype))

    @jax.jit
    def run(init, keys, t_idx):
        # Two-level scan so only the RETAINED samples are ever stacked:
        # a single flat scan would materialize the full state for every
        # burn-in and thinned-out step too — a factor
        # (burnin + samples*thin)/samples more sample memory (round-2
        # review; OOM for large [L, M, M] states).
        def advance(carry, inp):
            carry, _ = hmc_step(carry, inp)
            return carry, None

        carry, _ = jax.lax.scan(
            advance, init, (keys[:num_burnin_steps], t_idx[:num_burnin_steps])
        )

        sample_keys = keys[num_burnin_steps:].reshape(
            (num_samples, thin) + keys.shape[1:]  # works for typed keys too
        )
        sample_t = t_idx[num_burnin_steps:].reshape(num_samples, thin)

        def draw(carry, inp):
            carry, _ = jax.lax.scan(advance, carry, inp)
            return carry, (carry[0], carry[1])

        _, (qs, logps) = jax.lax.scan(draw, carry, (sample_keys, sample_t))
        return qs, logps

    return run(init, keys, t_idx)
