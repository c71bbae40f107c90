"""uncertain_conditional depth tests (reference
``tests/gpflow/conditionals/test_uncertain_conditional.py``): the analytic
psi-statistics moment matching must agree with (a) the plain conditional when
the input has zero uncertainty, (b) Monte-Carlo marginalization over the
input distribution (incl. full output covariance), and (c) full-covariance
Gauss-Hermite quadrature of the conditional moments at rtol 1e-6."""
from typing import Optional

import numpy as np
import pytest
from numpy.testing import assert_allclose

import gpflow_tpu
from gpflow_tpu.conditionals import conditional, uncertain_conditional
from gpflow_tpu.functions import Constant, Linear, Zero
from gpflow_tpu.inducing_variables import InducingPoints
from gpflow_tpu.quadrature import mvnquad

rng = np.random.RandomState(1)

MEANS = ["Constant", "Linear", "Zero", None]


def mean_function_factory(name: Optional[str], D_in: int, D_out: int):
    if name == "Zero":
        return Zero(output_dim=D_out)
    if name == "Constant":
        return Constant(c=rng.rand(D_out))
    if name == "Linear":
        return Linear(A=rng.rand(D_in, D_out), b=rng.rand(D_out))
    return None


def gen_L(n: int, *shape: int) -> np.ndarray:
    return np.array([np.tril(rng.randn(*shape)) for _ in range(n)])


def _make_model(D_in, D_out, X, whiten, mean_function, seed=0):
    """SVGP with Z = X and a NON-trivial random variational distribution
    (the reference gets one by running Adam; setting it directly is an
    equally strong and much cheaper test of the same math)."""
    r = np.random.RandomState(seed)
    M = X.shape[0]
    q_mu = 0.5 * r.randn(M, D_out)
    q_sqrt = 0.2 * np.array([np.tril(r.randn(M, M)) for _ in range(D_out)])
    return gpflow_tpu.models.SVGP(
        kernel=gpflow_tpu.kernels.SquaredExponential(variance=0.5 + rng.rand()),
        likelihood=gpflow_tpu.likelihoods.Gaussian(),
        inducing_variable=X.copy(),
        num_latent_gps=D_out,
        whiten=whiten,
        mean_function=mean_function,
        q_mu=q_mu,
        q_sqrt=q_sqrt,
    )


def _uncertain_predict(model, Xmu, Xcov, full_output_cov):
    return uncertain_conditional(
        Xmu,
        Xcov,
        model.inducing_variable,
        model.kernel,
        model.q_mu.value,
        model.q_sqrt.value,
        mean_function=model.mean_function,
        white=model.whiten,
        full_output_cov=full_output_cov,
    )


def _mc_predict(model, Xmu, Xchol, mc_iter=1_000_000, seed=42):
    """Monte-Carlo marginalization over x ~ N(Xmu, Xchol Xchol^T)."""
    r = np.random.RandomState(seed)
    D_in = Xchol.shape[0]
    X_samples = Xmu + (Xchol[None] @ r.randn(mc_iter, D_in)[:, :, None])[:, :, 0]
    F_mu, F_var = model.predict_f(X_samples)
    F_mu, F_var = np.asarray(F_mu), np.asarray(F_var)
    F_samples = F_mu + r.randn(*F_var.shape) * np.sqrt(F_var)
    return np.mean(F_samples, axis=0), np.cov(F_samples.T)


class Data:
    N = 7
    N_new = 2
    D_out = 3
    D_in = 1
    X = np.linspace(-5, 5, N)[:, None] + rng.randn(N, 1)
    Xnew_mu = rng.randn(N_new, 1)
    Xnew_covar = np.zeros((N_new, 1, 1))


class DataMC2:
    N = 7
    N_new = 5
    D_out = 4
    D_in = 2
    X = rng.randn(N, D_in)
    Xnew_mu = rng.randn(N_new, D_in)
    L = 0.5 * gen_L(N_new, D_in, D_in)
    Xnew_covar = np.array([l @ l.T for l in L])


@pytest.mark.parametrize("white", [True, False])
@pytest.mark.parametrize("mean", MEANS)
def test_no_uncertainty(white, mean):
    """Zero input covariance: moment matching reduces to the conditional."""
    mean_function = mean_function_factory(mean, Data.D_in, Data.D_out)
    model = _make_model(Data.D_in, Data.D_out, Data.X, white, mean_function)
    mean1, var1 = model.predict_f(Data.Xnew_mu)
    mean2, var2 = _uncertain_predict(
        model, Data.Xnew_mu, Data.Xnew_covar, full_output_cov=False
    )
    assert_allclose(np.asarray(mean1), np.asarray(mean2), atol=1e-8)
    assert_allclose(np.asarray(var1), np.asarray(var2), atol=1e-8)


@pytest.mark.parametrize("white", [True, False])
@pytest.mark.parametrize("mean", MEANS)
def test_monte_carlo_1_din(white, mean):
    mean_function = mean_function_factory(mean, Data.D_in, Data.D_out)
    model = _make_model(Data.D_in, Data.D_out, Data.X, white, mean_function)
    Xnew_covar = 0.25 * np.ones((Data.N_new, 1, 1))
    mean1, var1 = _uncertain_predict(model, Data.Xnew_mu, Xnew_covar, full_output_cov=True)
    mean1, var1 = np.asarray(mean1), np.asarray(var1)
    for n in range(Data.N_new):
        mean2, var2 = _mc_predict(model, Data.Xnew_mu[n], np.sqrt(Xnew_covar[n]))
        assert_allclose(mean1[n], mean2, atol=1e-2, rtol=1e-1)
        assert_allclose(var1[n], var2, atol=1e-2, rtol=1e-1)


@pytest.mark.parametrize("white", [True, False])
@pytest.mark.parametrize("mean", MEANS)
def test_monte_carlo_2_din(white, mean):
    mean_function = mean_function_factory(mean, DataMC2.D_in, DataMC2.D_out)
    model = _make_model(DataMC2.D_in, DataMC2.D_out, DataMC2.X, white, mean_function)
    mean1, var1 = _uncertain_predict(
        model, DataMC2.Xnew_mu, DataMC2.Xnew_covar, full_output_cov=True
    )
    mean1, var1 = np.asarray(mean1), np.asarray(var1)
    for n in range(DataMC2.N_new):
        mean2, var2 = _mc_predict(model, DataMC2.Xnew_mu[n], DataMC2.L[n])
        assert_allclose(mean1[n], mean2, atol=1e-2, rtol=1e-1)
        assert_allclose(var1[n], var2, atol=1e-2, rtol=1e-1)


class DataQuad:
    num_data = 10
    num_ind = 10
    D_in = 2
    D_out = 3
    H = 150
    Xmu = rng.randn(num_data, D_in)
    L = gen_L(num_data, D_in, D_in)
    Xvar = np.array([l @ l.T for l in L])
    Z = rng.randn(num_ind, D_in)
    q_mu = rng.randn(num_ind, D_out)
    q_sqrt = gen_L(D_out, num_ind, num_ind)


@pytest.mark.parametrize("white", [True, False])
@pytest.mark.parametrize("mean", MEANS)
def test_quadrature(white, mean):
    """Analytic psi-statistics vs full-covariance Gauss-Hermite quadrature of
    the conditional moments (law of total variance), rtol 1e-6."""
    kernel = gpflow_tpu.kernels.SquaredExponential()
    inducing_variable = InducingPoints(DataQuad.Z)
    mean_function = mean_function_factory(mean, DataQuad.D_in, DataQuad.D_out)
    effective_mean = mean_function or (lambda X: 0.0)

    def conditional_fn(X):
        return conditional(
            X, inducing_variable, kernel, DataQuad.q_mu, q_sqrt=DataQuad.q_sqrt, white=white
        )

    def mean_fn(X):
        return conditional_fn(X)[0] + effective_mean(X)

    def var_fn(X):
        return conditional_fn(X)[1]

    quad_args = (DataQuad.Xmu, DataQuad.Xvar, DataQuad.H, DataQuad.D_in, (DataQuad.D_out,))
    mean_quad = np.asarray(mvnquad(mean_fn, *quad_args))
    var_quad = np.asarray(mvnquad(var_fn, *quad_args))
    mean_sq_quad = np.asarray(mvnquad(lambda X: mean_fn(X) ** 2, *quad_args))
    var_quad = var_quad + (mean_sq_quad - mean_quad ** 2)

    mean_analytic, var_analytic = uncertain_conditional(
        DataQuad.Xmu,
        DataQuad.Xvar,
        inducing_variable,
        kernel,
        DataQuad.q_mu,
        DataQuad.q_sqrt,
        mean_function=mean_function,
        full_output_cov=False,
        white=white,
    )
    assert_allclose(mean_quad, np.asarray(mean_analytic), rtol=1e-6)
    assert_allclose(var_quad, np.asarray(var_analytic), rtol=1e-6)
