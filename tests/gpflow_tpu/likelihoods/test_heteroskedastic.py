"""Heteroskedastic likelihood equivalences (patterns from reference
``tests/gpflow/likelihoods/test_heteroskedastic.py`` and
``test_heteroskedastic_constant_variance.py``): with the scale latent
clamped to a constant, HeteroskedasticTFPConditional must reproduce the
plain Gaussian likelihood."""
import numpy as np
import pytest

from gpflow_tpu import likelihoods

rng = np.random.RandomState(23)
N = 9
VARIANCE = 0.3

X = rng.randn(N, 1)
Y = rng.randn(N, 1)
F_MU = rng.randn(N, 1)
F_VAR = np.abs(rng.randn(N, 1)) + 0.2

# two-latent inputs: [loc, log-scale]; scale latent is deterministic
F2_MU = np.concatenate([F_MU, np.full((N, 1), 0.5 * np.log(VARIANCE))], axis=1)
F2_VAR = np.concatenate([F_VAR, np.zeros((N, 1))], axis=1)


@pytest.fixture
def het():
    return likelihoods.HeteroskedasticTFPConditional()


@pytest.fixture
def gauss():
    return likelihoods.Gaussian(VARIANCE)


def test_log_prob_matches_gaussian(het, gauss):
    F2 = np.concatenate([F_MU, np.full((N, 1), 0.5 * np.log(VARIANCE))], axis=1)
    np.testing.assert_allclose(
        np.asarray(het.log_prob(X, F2, Y)),
        np.asarray(gauss.log_prob(X, F_MU, Y)),
        rtol=1e-6,
    )


def test_conditional_mean_and_variance(het):
    F2 = np.concatenate([F_MU, np.full((N, 1), 0.5 * np.log(VARIANCE))], axis=1)
    np.testing.assert_allclose(
        np.asarray(het.conditional_mean(X, F2)), F_MU, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(het.conditional_variance(X, F2)), np.full((N, 1), VARIANCE), rtol=1e-6
    )


def test_predict_mean_and_var_matches_gaussian(het, gauss):
    mu_h, var_h = (np.asarray(a) for a in het.predict_mean_and_var(X, F2_MU, F2_VAR))
    mu_g, var_g = (np.asarray(a) for a in gauss.predict_mean_and_var(X, F_MU, F_VAR))
    np.testing.assert_allclose(mu_h, mu_g, atol=2e-3)
    np.testing.assert_allclose(var_h, var_g, rtol=2e-2)


def test_variational_expectations_matches_gaussian(het, gauss):
    ve_h = np.asarray(het.variational_expectations(X, F2_MU, F2_VAR, Y))
    ve_g = np.asarray(gauss.variational_expectations(X, F_MU, F_VAR, Y))
    np.testing.assert_allclose(ve_h, ve_g, rtol=2e-2, atol=2e-2)


def test_predict_log_density_matches_gaussian(het, gauss):
    ld_h = np.asarray(het.predict_log_density(X, F2_MU, F2_VAR, Y))
    ld_g = np.asarray(gauss.predict_log_density(X, F_MU, F_VAR, Y))
    np.testing.assert_allclose(ld_h, ld_g, rtol=2e-2, atol=2e-2)


def test_analytic_mean_and_var_against_moment_formula():
    """E[y] = E[loc]; Var[y] = Var[loc] + E[scale^2] with scale = exp(g),
    g ~ N(mu_g, var_g) => E[exp(2g)] = exp(2 mu_g + 2 var_g) (lognormal)."""
    het = likelihoods.HeteroskedasticTFPConditional()
    mu_g = np.full((N, 1), -0.4)
    var_g = np.full((N, 1), 0.09)
    F2m = np.concatenate([F_MU, mu_g], axis=1)
    F2v = np.concatenate([F_VAR, var_g], axis=1)
    mu, var = (np.asarray(a) for a in het.predict_mean_and_var(X, F2m, F2v))
    np.testing.assert_allclose(mu, F_MU, atol=2e-3)
    expected_var = F_VAR + np.exp(2 * mu_g + 2 * var_g)
    np.testing.assert_allclose(var, expected_var, rtol=3e-2)


# ---- StudentT-distribution variant (reference
# ``test_heteroskedastic_constant_variance.py:54-141``) ----

G_VAR = 0.345
F2S_MU = np.concatenate([F_MU, np.full((N, 1), 0.5 * np.log(G_VAR))], axis=1)
F2S_VAR = np.concatenate([F_VAR, np.zeros((N, 1))], axis=1)


@pytest.fixture
def het_t():
    from gpflow_tpu.likelihoods.multilatent import StudentTDistribution

    return likelihoods.HeteroskedasticTFPConditional(
        distribution_class=StudentTDistribution
    )


@pytest.fixture
def homo_t():
    return likelihoods.StudentT(scale=G_VAR ** 0.5, df=3.0)


def test_studentt_log_prob(het_t, homo_t):
    np.testing.assert_allclose(
        np.asarray(het_t.log_prob(X, F2S_MU, Y)),
        np.asarray(homo_t.log_prob(X, F_MU, Y)),
        rtol=1e-6,
    )


def test_studentt_conditional_moments(het_t, homo_t):
    np.testing.assert_allclose(
        np.asarray(het_t.conditional_mean(X, F2S_MU)),
        np.asarray(homo_t.conditional_mean(X, F_MU)),
        atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(het_t.conditional_variance(X, F2S_MU)),
        np.asarray(homo_t.conditional_variance(X, F_MU)),
        rtol=1e-6,
    )


def test_studentt_variational_expectations(het_t, homo_t):
    np.testing.assert_allclose(
        np.asarray(het_t.variational_expectations(X, F2S_MU, F2S_VAR, Y)),
        np.asarray(homo_t.variational_expectations(X, F_MU, F_VAR, Y)),
        atol=4e-3,  # reference sees ~3.4e-3 between the two quadrature layouts
    )


def test_studentt_predict_mean_and_var(het_t, homo_t):
    mu_h, var_h = (np.asarray(a) for a in het_t.predict_mean_and_var(X, F2S_MU, F2S_VAR))
    mu_g, var_g = (np.asarray(a) for a in homo_t.predict_mean_and_var(X, F_MU, F_VAR))
    np.testing.assert_allclose(mu_h, mu_g, atol=1e-6)
    np.testing.assert_allclose(var_h, var_g, rtol=1e-6)


def test_studentt_predict_log_density(het_t, homo_t):
    np.testing.assert_allclose(
        np.asarray(het_t.predict_log_density(X, F2S_MU, F2S_VAR, Y)),
        np.asarray(homo_t.predict_log_density(X, F_MU, F_VAR, Y)),
        atol=3e-2,  # reference sees ~2.5e-2 between quadrature layouts
    )
