"""Parameter priors and log_prior_density (pattern from reference
``tests/gpflow/test_base_prior.py``): prior on the constrained vs the
unconstrained value, including the change-of-variables Jacobian."""
import numpy as np
import pytest
from scipy import stats

import gpflow_tpu
from gpflow_tpu import priors
from gpflow_tpu.base import Parameter, PriorOn
from gpflow_tpu.utilities.bijectors import positive

rng = np.random.RandomState(21)


def test_no_prior_is_zero():
    p = Parameter(1.3, transform=positive())
    assert float(p.log_prior_density()) == 0.0


def test_prior_on_constrained_is_plain_log_prob():
    """prior_on='constrained': evaluation is in the same space as the prior,
    no Jacobian (reference ``base.py:209-211``)."""
    value = 1.7
    p = Parameter(value, transform=positive(), prior=priors.Gamma(2.0, 0.5))
    p.prior_on = PriorOn.CONSTRAINED
    expected = stats.gamma.logpdf(value, 2.0, scale=1.0 / 0.5)  # rate param
    np.testing.assert_allclose(float(p.log_prior_density()), expected, rtol=1e-6)


def test_prior_on_unconstrained_includes_inverse_jacobian():
    """prior_on='unconstrained': the density is still of the CONSTRAINED
    variable, so it picks up inverse_log_det_jacobian = -fldj(u)
    (reference ``base.py:213-223``)."""
    value = 1.7
    p = Parameter(value, transform=positive(), prior=priors.Normal(0.0, 1.0))
    p.prior_on = "unconstrained"
    u = float(np.asarray(p.unconstrained_variable))
    eps = 1e-6
    f = lambda t: float(np.asarray(p.transform.forward(t)))
    deriv = (f(u + eps) - f(u - eps)) / (2 * eps)
    expected = stats.norm.logpdf(u) - np.log(abs(deriv))
    np.testing.assert_allclose(float(p.log_prior_density()), expected, rtol=1e-4)


@pytest.mark.parametrize(
    "prior,ref_logpdf,domain",
    [
        (priors.Normal(0.5, 2.0), lambda x: stats.norm.logpdf(x, 0.5, 2.0), "real"),
        (priors.LogNormal(0.1, 1.5), lambda x: stats.lognorm.logpdf(x, 1.5, scale=np.exp(0.1)), "pos"),
        (priors.Gamma(2.0, 0.5), lambda x: stats.gamma.logpdf(x, 2.0, scale=1.0 / 0.5), "pos"),
        (priors.Exponential(1.3), lambda x: stats.expon.logpdf(x, scale=1 / 1.3), "pos"),
        (priors.Beta(2.0, 3.0), lambda x: stats.beta.logpdf(x, 2.0, 3.0), "unit"),
        (priors.Laplace(0.0, 1.2), lambda x: stats.laplace.logpdf(x, 0.0, 1.2), "real"),
        (priors.StudentT(3.0, 0.0, 1.0), lambda x: stats.t.logpdf(x, 3.0), "real"),
        (priors.HalfNormal(1.5), lambda x: stats.halfnorm.logpdf(x, scale=1.5), "pos"),
        (priors.Uniform(-1.0, 2.0), lambda x: stats.uniform.logpdf(x, -1.0, 3.0), "interval"),
    ],
    ids=lambda o: type(o).__name__ if isinstance(o, priors.Prior) else "",
)
def test_prior_log_prob_vs_scipy(prior, ref_logpdf, domain):
    if domain == "real":
        x = rng.randn(8)
    elif domain == "pos":
        x = np.abs(rng.randn(8)) + 0.1
    elif domain == "unit":
        x = rng.rand(8) * 0.9 + 0.05
    else:
        x = rng.rand(8) * 2.5 - 0.8
    np.testing.assert_allclose(
        np.asarray(prior.log_prob(x)), ref_logpdf(x), atol=1e-7
    )


def test_model_log_prior_density_sums_trainable_priors():
    m = gpflow_tpu.models.GPR(
        (rng.randn(5, 1), rng.randn(5, 1)),
        kernel=gpflow_tpu.kernels.SquaredExponential(),
    )
    assert float(m.log_prior_density()) == 0.0
    m.kernel.variance.prior = priors.LogNormal(0.0, 1.0)
    m.kernel.lengthscales.prior = priors.Gamma(2.0, 0.5)
    total = float(m.log_prior_density())
    expected = float(m.kernel.variance.log_prior_density()) + float(
        m.kernel.lengthscales.log_prior_density()
    )
    np.testing.assert_allclose(total, expected, rtol=1e-6)
    # non-trainable parameters do not contribute
    gpflow_tpu.set_trainable(m.kernel.variance, False)
    np.testing.assert_allclose(
        float(m.log_prior_density()),
        float(m.kernel.lengthscales.log_prior_density()),
        rtol=1e-6,
    )


def test_map_shifts_optimum():
    """A tight prior on the lengthscale pulls the MAP fit toward it."""
    X = np.linspace(0, 6, 40)[:, None]
    Y = np.sin(X) + 0.1 * rng.randn(40, 1)

    def fit(with_prior):
        m = gpflow_tpu.models.GPR(
            (X, Y), kernel=gpflow_tpu.kernels.SquaredExponential(), noise_variance=0.01
        )
        if with_prior:
            m.kernel.lengthscales.prior = priors.LogNormal(np.log(5.0), 0.05)
        gpflow_tpu.optimizers.Scipy().minimize(
            m.training_loss, m.trainable_variables, options={"maxiter": 200}
        )
        return float(m.kernel.lengthscales.value)

    ls_ml, ls_map = fit(False), fit(True)
    assert abs(ls_map - 5.0) < abs(ls_ml - 5.0)
