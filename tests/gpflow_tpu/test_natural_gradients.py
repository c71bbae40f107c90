"""Natural-gradient correctness properties (pattern from reference
``tests/gpflow/optimizers/test_natural_gradients.py``):

* gamma=1 with a Gaussian likelihood jumps (q_mu, q_sqrt) to the EXACT
  variational optimum in ONE step - the ELBO then equals SGPR's collapsed
  bound at the same hyperparameters (whitened and unwhitened).
* XiNat and XiSqrtMeanVar parameterizations agree at small gamma.
"""
import numpy as np
import pytest

from gpflow_tpu import kernels, likelihoods
from gpflow_tpu.models import SGPR, SVGP
from gpflow_tpu.optimizers import NaturalGradient
from gpflow_tpu.optimizers.natgrad import XiNat, XiSqrtMeanVar

rng = np.random.RandomState(0)
N, D, M = 60, 2, 10
X = rng.randn(N, D)
Y = np.sin(X[:, :1]) + 0.1 * rng.randn(N, 1)
Z = X[:M].copy()


def _svgp(whiten):
    return SVGP(
        kernel=kernels.SquaredExponential(lengthscales=0.8),
        likelihood=likelihoods.Gaussian(0.1),
        inducing_variable=Z.copy(),
        whiten=whiten,
        num_data=N,
    )


@pytest.mark.parametrize("whiten", [True, False])
def test_gamma_one_gaussian_reaches_optimum_in_one_step(whiten):
    model = _svgp(whiten)
    sgpr = SGPR(
        (X, Y),
        kernel=kernels.SquaredExponential(lengthscales=0.8),
        inducing_variable=Z.copy(),
        noise_variance=0.1,
    )
    optimal = float(sgpr.elbo())  # collapsed bound = optimum over q(u)

    before = float(model.elbo((X, Y)))
    NaturalGradient(gamma=1.0).minimize(
        lambda: model.training_loss((X, Y)), [(model.q_mu, model.q_sqrt)]
    )
    after = float(model.elbo((X, Y)))
    assert after > before
    np.testing.assert_allclose(after, optimal, rtol=1e-8)

    # a second step must be a no-op (already at the optimum)
    NaturalGradient(gamma=1.0).minimize(
        lambda: model.training_loss((X, Y)), [(model.q_mu, model.q_sqrt)]
    )
    np.testing.assert_allclose(float(model.elbo((X, Y))), optimal, rtol=1e-8)


def test_xi_transforms_agree_to_second_order():
    """Any two valid xi parameterizations take the same step up to O(gamma^2):
    the parameter difference must shrink ~quadratically as gamma drops 10x."""

    def step_diff(gamma):
        mus = []
        for xi in (XiNat(), XiSqrtMeanVar()):
            model = _svgp(True)
            NaturalGradient(gamma=gamma, xi_transform=xi).minimize(
                lambda: model.training_loss((X, Y)), [(model.q_mu, model.q_sqrt)]
            )
            mus.append(np.asarray(model.q_mu.value))
        return np.abs(mus[0] - mus[1]).max()

    d3, d4 = step_diff(1e-3), step_diff(1e-4)
    assert d4 < 1e-3  # near-identical in absolute terms
    assert d3 / d4 > 30  # quadratic (=100), NOT first-order (=10), in gamma


def test_natgrad_improves_nonconjugate():
    model = SVGP(
        kernel=kernels.SquaredExponential(),
        likelihood=likelihoods.Bernoulli(),
        inducing_variable=Z.copy(),
        num_data=N,
    )
    Yb = (Y > 0).astype(float)
    before = float(model.elbo((X, Yb)))
    ng = NaturalGradient(gamma=0.5)
    for _ in range(5):
        ng.minimize(lambda: model.training_loss((X, Yb)), [(model.q_mu, model.q_sqrt)])
    assert float(model.elbo((X, Yb))) > before + 1.0


@pytest.mark.parametrize("whiten", [True, False])
def test_small_q_sqrt_handled_correctly(whiten):
    """Near-degenerate q_sqrt (tiny variance) must not break the natural
    parameter conversions (reference test_natural_gradient.py:158-168):
    one gamma=1 step still lands on the collapsed-bound optimum."""
    model = _svgp(whiten)
    model.q_sqrt.assign(1e-5 * np.stack([np.eye(M)]))
    sgpr = SGPR(
        (X, Y),
        kernel=kernels.SquaredExponential(lengthscales=0.8),
        inducing_variable=Z.copy(),
        noise_variance=0.1,
    )
    NaturalGradient(gamma=1.0).minimize(
        lambda: model.training_loss((X, Y)), [(model.q_mu, model.q_sqrt)]
    )
    np.testing.assert_allclose(
        float(model.elbo((X, Y))), float(sgpr.elbo()), rtol=1e-8
    )


def test_minimize_multiple_variational_pairs():
    """One minimize() call over TWO independent models' (q_mu, q_sqrt) pairs
    must move each to its own gamma=1 optimum (joint loss is separable)."""
    m1, m2 = _svgp(True), _svgp(True)
    Y2 = np.cos(X[:, :1]) + 0.1 * rng.randn(N, 1)

    def joint_loss():
        return m1.training_loss((X, Y)) + m2.training_loss((X, Y2))

    NaturalGradient(gamma=1.0).minimize(
        joint_loss, [(m1.q_mu, m1.q_sqrt), (m2.q_mu, m2.q_sqrt)]
    )
    for m, y in ((m1, Y), (m2, Y2)):
        sgpr = SGPR(
            (X, y),
            kernel=kernels.SquaredExponential(lengthscales=0.8),
            inducing_variable=Z.copy(),
            noise_variance=0.1,
        )
        np.testing.assert_allclose(
            float(m.elbo((X, y))), float(sgpr.elbo()), rtol=1e-8
        )


def test_compiled_step_tracks_hyperparameter_updates():
    """Regression (round-2 review): the cached compiled step must NOT bake
    hyperparameters in as constants — after the kernel/likelihood move
    (Adam's half of the alternating loop), the next natgrad step must
    match the eager (compile=False) result exactly."""

    def run(compile_):
        model = _svgp(True)
        ng = NaturalGradient(gamma=0.7, compile=compile_)
        loss = lambda: model.training_loss((X, Y))  # created ONCE, as recommended
        ng.minimize(loss, [(model.q_mu, model.q_sqrt)])
        # hyperparameter change between natgrad calls
        model.kernel.variance.assign(25.0)
        model.likelihood.variance.assign(0.5)
        ng.minimize(loss, [(model.q_mu, model.q_sqrt)])
        return np.asarray(model.q_mu.value), float(model.elbo((X, Y)))

    q_mu_c, elbo_c = run(True)
    q_mu_e, elbo_e = run(False)
    np.testing.assert_allclose(q_mu_c, q_mu_e, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(elbo_c, elbo_e, rtol=1e-10)


def test_compiled_step_advances_minibatch_iterator():
    """An iterator-backed loss must draw a FRESH batch every minimize call
    (previously the first batch was baked in at trace time forever)."""
    model = _svgp(True)
    seen = []

    def batches():
        i = 0
        while True:
            lo = (i * 20) % 40
            seen.append(lo)
            yield X[lo : lo + 20], Y[lo : lo + 20]
            i += 1

    it = batches()
    loss = lambda: model.training_loss(next(it))
    ng = NaturalGradient(gamma=0.3)
    for _ in range(3):
        ng.minimize(loss, [(model.q_mu, model.q_sqrt)])
    # first minimize draws twice (discovery trace + compile trace; the
    # compile draw is the one optimized against); each later call draws once
    assert seen == [0, 20, 0, 20], seen


def test_gamma_annealing_honored_by_compiled_step():
    """opt.gamma changed after the first compiled step must take effect
    (round-2 review: gamma was baked into the executable at trace time)."""
    model = _svgp(True)
    sgpr = SGPR(
        (X, Y),
        kernel=kernels.SquaredExponential(lengthscales=0.8),
        inducing_variable=Z.copy(),
        noise_variance=0.1,
    )
    optimal = float(sgpr.elbo())

    opt = NaturalGradient(gamma=0.01)
    loss = lambda: model.training_loss((X, Y))  # one closure object -> cached
    opt.minimize(loss, [(model.q_mu, model.q_sqrt)])
    assert abs(float(model.elbo((X, Y))) - optimal) > 1.0  # tiny step: far off

    opt.gamma = 1.0
    opt.minimize(loss, [(model.q_mu, model.q_sqrt)])  # cached executable
    # a gamma=1 step from ANY state reaches the collapsed optimum — only if
    # the new gamma actually reached the compiled step
    np.testing.assert_allclose(float(model.elbo((X, Y))), optimal, rtol=1e-8)


def test_compiled_step_cache_hits_for_bound_methods():
    """model.training_loss is a fresh bound-method object per access; the
    cache must key by equality, not id, or every step recompiles
    (round-2 review)."""
    from gpflow_tpu.models import VGP

    model = VGP(
        (X, Y),
        kernel=kernels.SquaredExponential(),
        likelihood=likelihoods.Gaussian(0.1),
    )
    opt = NaturalGradient(gamma=0.3)
    for _ in range(3):
        opt.minimize(model.training_loss, [(model.q_mu, model.q_sqrt)])
    assert len(opt._compiled_steps) == 1
