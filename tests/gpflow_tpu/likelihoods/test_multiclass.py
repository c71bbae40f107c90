"""Multiclass likelihood depth tests (pattern from reference
``tests/gpflow/likelihoods/test_multiclass.py``): RobustMax invlink values,
the GH ``prob_is_largest`` trick against a Monte Carlo oracle, and the
closed-form variational expectations identity."""
import numpy as np
import pytest

from gpflow_tpu import likelihoods

rng = np.random.RandomState(3)
K = 4
N = 6
Fmu = rng.randn(N, K)
Fvar = np.exp(0.5 * rng.randn(N, K))
Y = rng.randint(0, K, (N, 1)).astype(float)
X = rng.randn(N, 2)


def test_robustmax_invlink_values():
    eps = 0.1
    rm = likelihoods.RobustMax(K, epsilon=eps)
    F = rng.randn(N, K)
    p = np.asarray(rm(F))
    argmax = F.argmax(axis=1)
    for n in range(N):
        for k in range(K):
            expected = 1 - eps if k == argmax[n] else eps / (K - 1)
            np.testing.assert_allclose(p[n, k], expected, rtol=1e-12)


def test_prob_is_largest_vs_monte_carlo():
    """The Gauss-Hermite P(f_y = max_k f_k) against brute-force sampling."""
    lik = likelihoods.MultiClass(K)
    # predict_mean_and_var's mean[n, k] = P(argmax f = k)*(1-eps) + ...;
    # recover P(is largest) from the conditional mean through the invlink
    eps = float(lik.invlink.epsilon.value)
    mean, _ = lik.predict_mean_and_var(X, Fmu, Fvar)
    mean = np.asarray(mean)

    S = 200_000
    r = np.random.RandomState(11)
    f = Fmu[None] + np.sqrt(Fvar)[None] * r.randn(S, N, K)
    p_largest_mc = np.stack(
        [(f.argmax(axis=2) == k).mean(axis=0) for k in range(K)], axis=1
    )
    mean_mc = p_largest_mc * (1 - eps) + (1 - p_largest_mc) * eps / (K - 1)
    np.testing.assert_allclose(mean, mean_mc, atol=5e-3)
    # rows are probability vectors up to GH-quadrature truncation error
    np.testing.assert_allclose(mean.sum(axis=1), 1.0, atol=1e-3)


def test_variational_expectations_closed_form_identity():
    """var_exp = log(1-eps) P(largest) + log(eps/(K-1)) (1 - P(largest));
    recover P from predict_mean_and_var and check the identity."""
    lik = likelihoods.MultiClass(K)
    eps = float(lik.invlink.epsilon.value)
    mean, _ = lik.predict_mean_and_var(X, Fmu, Fvar)
    mean = np.asarray(mean)
    p_largest = (mean - eps / (K - 1)) / (1 - eps - eps / (K - 1))
    p_y = np.take_along_axis(p_largest, Y.astype(int), axis=1)[:, 0]
    expected = np.log(1 - eps) * p_y + np.log(eps / (K - 1)) * (1 - p_y)
    ve = np.asarray(lik.variational_expectations(X, Fmu, Fvar, Y))
    np.testing.assert_allclose(ve, expected, atol=1e-8)


def test_predict_log_density_matches_mean():
    """log-density of the observed class = log E[p(y|f)] = log mean_y."""
    lik = likelihoods.MultiClass(K)
    mean, _ = lik.predict_mean_and_var(X, Fmu, Fvar)
    expected = np.log(np.take_along_axis(np.asarray(mean), Y.astype(int), axis=1))[:, 0]
    ld = np.asarray(lik.predict_log_density(X, Fmu, Fvar, Y))
    np.testing.assert_allclose(ld, expected, atol=1e-8)


def test_robustmax_epsilon_k1_limits():
    rm = likelihoods.RobustMax(K, epsilon=1e-3)
    F = rng.randn(N, K) * 10
    p = np.asarray(rm(F))
    np.testing.assert_allclose(p.sum(axis=1), 1.0, rtol=1e-12)
    assert (p > 0).all() and (p < 1).all()


def test_multiclass_rejects_bad_num_classes():
    lik = likelihoods.MultiClass(K)
    with pytest.raises(Exception):
        # wrong latent dimension
        lik.variational_expectations(X, Fmu[:, : K - 1], Fvar[:, : K - 1], Y)
