"""HMC sampler behavior (counterpart of reference
``tests/gpflow/optimizers/test_mcmc.py`` + the SimpleStepSizeAdaptation
usage in the mcmc notebook)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpflow_tpu.optimizers.mcmc import run_hmc

MU = np.array([1.5, -0.7])
SIG = np.array([0.8, 2.0])


def _logp(x):
    return -0.5 * jnp.sum(((x - MU) / SIG) ** 2)


def test_hmc_recovers_gaussian_moments():
    samples, logps = run_hmc(
        _logp, (jnp.zeros(2),), num_samples=3000, num_burnin_steps=500,
        step_size=0.5, num_leapfrog_steps=8, key=jax.random.PRNGKey(0),
    )
    s = np.asarray(samples[0])
    np.testing.assert_allclose(s.mean(0), MU, atol=0.2)
    np.testing.assert_allclose(s.std(0), SIG, rtol=0.25)
    assert np.isfinite(np.asarray(logps)).all()


def test_step_size_adaptation_rescues_bad_initial_step():
    """Dual averaging must tune a hopeless step size (5.0: every proposal
    rejected) into a working sampler during burn-in."""
    samples, _ = run_hmc(
        _logp, (jnp.zeros(2),), num_samples=3000, num_burnin_steps=800,
        step_size=5.0, num_leapfrog_steps=8, adapt_step_size=True,
        key=jax.random.PRNGKey(3),
    )
    s = np.asarray(samples[0])
    moved = np.mean(np.any(np.diff(s, axis=0) != 0, axis=1))
    assert moved > 0.4  # near target_accept; an unadapted chain moves ~0
    np.testing.assert_allclose(s.mean(0), MU, atol=0.2)
    np.testing.assert_allclose(s.std(0), SIG, rtol=0.25)

    # contrast: same bad step WITHOUT adaptation never moves
    samples2, _ = run_hmc(
        _logp, (jnp.zeros(2),), num_samples=300, num_burnin_steps=100,
        step_size=5.0, num_leapfrog_steps=8, key=jax.random.PRNGKey(3),
    )
    s2 = np.asarray(samples2[0])
    assert np.mean(np.any(np.diff(s2, axis=0) != 0, axis=1)) < 0.1


def test_thinning_and_burnin_shapes():
    samples, logps = run_hmc(
        _logp, (jnp.zeros(2),), num_samples=50, num_burnin_steps=20,
        step_size=0.5, thin=3, key=jax.random.PRNGKey(1),
    )
    assert np.asarray(samples[0]).shape == (50, 2)
    assert np.asarray(logps).shape == (50,)


def test_tuple_state_multiple_leaves():
    def logp2(a, b):
        return -0.5 * jnp.sum(a**2) - 0.5 * jnp.sum((b - 2.0) ** 2)

    samples, _ = run_hmc(
        logp2, (jnp.zeros(3), jnp.zeros(())), num_samples=2000,
        num_burnin_steps=300, step_size=0.4, key=jax.random.PRNGKey(2),
    )
    np.testing.assert_allclose(np.asarray(samples[0]).mean(0), 0.0, atol=0.2)
    np.testing.assert_allclose(np.asarray(samples[1]).mean(), 2.0, atol=0.2)
