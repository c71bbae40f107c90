"""End-to-end tests for the BASELINE.json parity configurations:
1. GPR Snelson-style 1D, 2. SGPR Matern52 M=100, 3. SVGP Bernoulli + natgrad,
4. Multi-output SVGP (SharedIndependent / LinearCoregionalization),
5. Heteroskedastic SVGP.
"""
import jax
import numpy as np
import optax
import pytest

import gpflow_tpu
from gpflow_tpu import kernels, likelihoods
from gpflow_tpu.inducing_variables import (
    InducingPoints,
    SeparateIndependentInducingVariables,
    SharedIndependentInducingVariables,
)
from gpflow_tpu.models import GPR, SGPR, SVGP
from gpflow_tpu.optimizers import NaturalGradient, Scipy

rng = np.random.RandomState(0)


def test_config1_gpr_snelson_style():
    N = 100
    X = rng.rand(N, 1) * 6
    Y = np.sin(X) + 0.1 * rng.randn(N, 1)
    m = GPR((X, Y), kernel=kernels.SquaredExponential(), noise_variance=1.0)
    Scipy().minimize(m.training_loss, m.trainable_variables, options={"maxiter": 100})
    assert 0.005 < float(m.likelihood.variance.value) < 0.05
    Xt = np.linspace(0, 6, 50)[:, None]
    mean, var = m.predict_f(Xt)
    np.testing.assert_allclose(np.asarray(mean)[:, 0], np.sin(Xt)[:, 0], atol=0.35)


def test_config2_sgpr_matern52_m100():
    N, D, M = 500, 4, 100
    X = rng.rand(N, D)
    Y = np.sin(3 * X[:, :1]) + 0.3 * np.cos(X @ np.ones((D, 1))) + 0.05 * rng.randn(N, 1)
    m = SGPR(
        (X, Y),
        kernel=kernels.Matern52(lengthscales=np.ones(D)),
        inducing_variable=X[:M].copy(),
        noise_variance=0.5,
    )
    initial = float(m.elbo())
    Scipy().minimize(m.training_loss, m.trainable_variables, options={"maxiter": 60})
    assert float(m.elbo()) > initial + 50
    assert float(m.elbo()) <= float(m.upper_bound()) + 1e-4


def test_config3_svgp_bernoulli_natgrad():
    N = 200
    X = rng.randn(N, 2)
    Y = ((np.sin(2 * X[:, 0]) + X[:, 1]) > 0).astype(float)[:, None]
    m = SVGP(
        kernel=kernels.SquaredExponential(),
        likelihood=likelihoods.Bernoulli(),
        inducing_variable=X[:32].copy(),
        num_data=N,
    )
    natgrad = NaturalGradient(gamma=0.5)
    loss = lambda: -m.elbo((X, Y))
    before = float(m.elbo((X, Y)))
    for _ in range(10):
        natgrad.minimize(loss, [(m.q_mu, m.q_sqrt)])
    after = float(m.elbo((X, Y)))
    assert after > before + 10


@pytest.mark.parametrize("setup", ["shared", "coregion"])
def test_config4_multioutput_svgp_trains(setup):
    N, D, M, P, L = 120, 2, 16, 3, 2
    X = rng.rand(N, D) * 2
    G = np.concatenate([np.sin(3 * X[:, :1]), np.cos(3 * X[:, 1:])], axis=1)  # [N, 2]
    W_true = rng.randn(P, 2)
    Y = G @ W_true.T + 0.05 * rng.randn(N, P)

    if setup == "shared":
        kernel = kernels.SharedIndependent(kernels.SquaredExponential(), output_dim=P)
        iv = SharedIndependentInducingVariables(InducingPoints(X[:M].copy()))
        num_latent = P
    else:
        kernel = kernels.LinearCoregionalization(
            [kernels.SquaredExponential(lengthscales=0.5 + i) for i in range(L)],
            W=rng.randn(P, L),
        )
        iv = SeparateIndependentInducingVariables(
            [InducingPoints(X[:M].copy() + 0.05 * i) for i in range(L)]
        )
        num_latent = L

    m = SVGP(
        kernel=kernel,
        likelihood=likelihoods.Gaussian(0.1),
        inducing_variable=iv,
        num_latent_gps=num_latent,
        num_data=N,
    )
    before = float(m.elbo((X, Y)))

    params = m.trainable_parameters
    opt = optax.adam(0.05)

    def loss_fn(unc):
        old = [p._unconstrained for p in params]
        try:
            for p, u in zip(params, unc):
                p._unconstrained = u
            return -m.elbo((X, Y))
        finally:
            for p, o in zip(params, old):
                p._unconstrained = o

    vg = jax.jit(jax.value_and_grad(loss_fn))
    unc = tuple(p._unconstrained for p in params)
    state = opt.init(unc)
    for _ in range(100):
        l, g = vg(unc)
        upd, state = opt.update(g, state)
        unc = tuple(u + du for u, du in zip(unc, jax.tree_util.tree_leaves(upd)))
    for p, u in zip(params, unc):
        p.assign_unconstrained(u)

    after = float(m.elbo((X, Y)))
    assert after > before + 100
    mean, var = m.predict_f(X[:10])
    assert np.asarray(mean).shape == (10, P)
    rmse = float(np.sqrt(np.mean((np.asarray(m.predict_f(X)[0]) - Y) ** 2)))
    assert rmse < 0.5


def test_config5_heteroskedastic_svgp():
    """Two latent GPs parameterize loc and scale; noise grows with x."""
    N = 150
    X = np.linspace(0, 4, N)[:, None]
    noise_scale = 0.05 + 0.2 * X[:, 0]
    Y = (np.sin(2 * X[:, 0]) + noise_scale * rng.randn(N))[:, None]

    likelihood = likelihoods.HeteroskedasticTFPConditional()
    kernel = kernels.SeparateIndependent(
        [kernels.SquaredExponential(), kernels.SquaredExponential()]
    )
    iv = SeparateIndependentInducingVariables(
        [InducingPoints(X[::10].copy()), InducingPoints(X[::10].copy())]
    )
    m = SVGP(
        kernel=kernel,
        likelihood=likelihood,
        inducing_variable=iv,
        num_latent_gps=2,
        num_data=N,
    )
    before = float(m.elbo((X, Y)))
    natgrad = NaturalGradient(gamma=0.5)
    params = [p for p in m.trainable_parameters if p not in (m.q_mu, m.q_sqrt)]

    import optax

    opt = optax.adam(0.01)

    def loss_fn(unc):
        old = [p._unconstrained for p in params]
        try:
            for p, u in zip(params, unc):
                p._unconstrained = u
            return -m.elbo((X, Y))
        finally:
            for p, o in zip(params, old):
                p._unconstrained = o

    vg = jax.jit(jax.value_and_grad(loss_fn))
    unc = tuple(p._unconstrained for p in params)
    state = opt.init(unc)
    for _ in range(80):
        natgrad.minimize(lambda: -m.elbo((X, Y)), [(m.q_mu, m.q_sqrt)])
        l, g = vg(unc)
        upd, state = opt.update(g, state)
        unc = tuple(u + du for u, du in zip(unc, jax.tree_util.tree_leaves(upd)))
        for p, u in zip(params, unc):
            p._unconstrained = u
    after = float(m.elbo((X, Y)))
    assert after > before + 50

    # the learned observation noise scale must increase with x
    fmean, _ = m.predict_f(X)
    scale = np.exp(np.asarray(fmean)[:, 1])
    assert scale[-10:].mean() > 2.0 * scale[:10].mean()
