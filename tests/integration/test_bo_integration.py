"""Bayesian-optimization-style loop (pattern from reference
``tests/gpflow/posteriors/test_bo_integration.py``): iteratively grow the
dataset, re-fit, and query the cached posterior — the loop a BO library
drives. Uses VGP + ``update_vgp_data`` (which re-parameterizes the
variational state for the new data, reference ``vgp.py:224-263``) and GPR."""
import numpy as np

import gpflow_tpu as gpf
from gpflow_tpu.models import GPR, VGP, update_vgp_data

rng = np.random.RandomState(41)


def objective(x):
    return np.sin(3 * x) + 0.3 * x ** 2


def test_gpr_bo_loop_picks_good_points():
    X = rng.uniform(-2, 2, (4, 1))
    Y = objective(X)
    candidates = np.linspace(-2, 2, 101)[:, None]

    for _ in range(5):
        m = GPR((X, Y), kernel=gpf.kernels.SquaredExponential(), noise_variance=1e-4)
        gpf.optimizers.Scipy().minimize(
            m.training_loss, m.trainable_variables, options={"maxiter": 50}
        )
        post = m.posterior()
        mu, var = (np.asarray(a) for a in post.predict_f(candidates))
        # lower confidence bound acquisition (minimization)
        lcb = mu - 2.0 * np.sqrt(np.maximum(var, 0))
        x_next = candidates[np.argmin(lcb)]
        X = np.vstack([X, x_next[None]])
        Y = np.vstack([Y, objective(x_next)[None]])

    true_min = objective(candidates).min()
    assert Y.min() < true_min + 0.15, (Y.min(), true_min)


def test_vgp_update_data_bo_loop():
    X = rng.uniform(-2, 2, (6, 1))
    Y = objective(X) + 0.05 * rng.randn(6, 1)

    m = VGP((X, Y), kernel=gpf.kernels.SquaredExponential(),
            likelihood=gpf.likelihoods.Gaussian(0.01))
    gpf.optimizers.Scipy().minimize(
        m.training_loss, m.trainable_variables, options={"maxiter": 60}
    )

    candidates = np.linspace(-2, 2, 51)[:, None]
    for _ in range(3):
        mu, var = (np.asarray(a) for a in m.predict_f(candidates))
        x_next = candidates[np.argmin(mu - 2 * np.sqrt(np.maximum(var, 0)))]
        X = np.vstack([X, x_next[None]])
        Y = np.vstack([Y, objective(x_next)[None] + 0.05 * rng.randn(1, 1)])
        # re-parameterize the variational state onto the grown dataset
        update_vgp_data(m, (X, Y))
        elbo_warm = float(m.elbo())
        assert np.isfinite(elbo_warm)
        gpf.optimizers.Scipy().minimize(
            m.training_loss, m.trainable_variables, options={"maxiter": 30}
        )
        assert float(m.elbo()) >= elbo_warm - 1e-6

    assert m.q_mu.shape[0] == len(X)
    mu_final, _ = m.predict_f(X)
    # fitted posterior mean tracks the (low-noise) observations
    assert float(np.mean((np.asarray(mu_final) - Y) ** 2)) < 0.1
