"""Cache life-cycle semantics for every posterior family (pattern from
reference ``tests/gpflow/posteriors/test_posteriors.py:620-853``).

The reference distinguishes TENSOR (constants baked into the graph) from
VARIABLE (tf.Variables refreshed in place); in JAX caches are always plain
arrays, so ``PrecomputeCacheType.VARIABLE`` is accepted for API parity and
behaves as TENSOR (documented deviation, ``gpflow_tpu/posteriors.py:12``).
These tests pin the parts of the contract that survive the translation:
update_cache() with no prior type raises, NOCACHE clears, VARIABLE/TENSOR
populate, and a refreshed cache reflects updated q_mu/q_sqrt values.
"""
import numpy as np
import pytest

from gpflow_tpu import Parameter, kernels, likelihoods
from gpflow_tpu.functions import Zero
from gpflow_tpu.inducing_variables import InducingPoints
from gpflow_tpu.posteriors import (
    GPRPosterior,
    IndependentPosteriorSingleOutput,
    PrecomputeCacheType,
    SGPRPosterior,
    VGPPosterior,
)

rng = np.random.RandomState(3)
M, D = 4, 2
Z = rng.randn(M, D)
X = rng.randn(M, D)
Y = rng.randn(M, 1)


def _q_sqrt(form):
    if form == "none":
        return None
    if form == "diag":
        return np.abs(rng.randn(M, 1)) + 0.3
    return np.tril(rng.randn(1, M, M) * 0.2 + 2 * np.eye(M))


def _svgp_posterior(q_sqrt_form, whiten, precompute_cache, as_parameters=False):
    q_mu = rng.randn(M, 1)
    q_sqrt = _q_sqrt(q_sqrt_form)
    if as_parameters:
        q_mu = Parameter(q_mu)
        q_sqrt = None if q_sqrt is None else Parameter(q_sqrt)
    return IndependentPosteriorSingleOutput(
        kernel=kernels.SquaredExponential(),
        inducing_variable=InducingPoints(Z.copy()),
        q_mu=q_mu,
        q_sqrt=q_sqrt,
        whiten=whiten,
        precompute_cache=precompute_cache,
    )


@pytest.mark.parametrize("q_sqrt_form", ["none", "diag", "full"])
@pytest.mark.parametrize("whiten", [True, False])
@pytest.mark.parametrize(
    "initial", [PrecomputeCacheType.NOCACHE, PrecomputeCacheType.TENSOR]
)
def test_update_cache_to_variable_populates(q_sqrt_form, whiten, initial):
    posterior = _svgp_posterior(q_sqrt_form, whiten, initial)
    posterior.update_cache(PrecomputeCacheType.VARIABLE)
    assert posterior.cache
    alpha, Qinv = posterior.cache
    assert np.all(np.isfinite(np.asarray(alpha)))
    assert np.all(np.isfinite(np.asarray(Qinv)))


@pytest.mark.parametrize(
    "initial", [PrecomputeCacheType.NOCACHE, PrecomputeCacheType.TENSOR]
)
def test_gpr_posterior_update_cache(initial):
    posterior = GPRPosterior(
        kernel=kernels.SquaredExponential(),
        data=(X, Y),
        likelihood=likelihoods.Gaussian(0.1),
        mean_function=Zero(),
        precompute_cache=initial,
    )
    posterior.update_cache(PrecomputeCacheType.VARIABLE)
    # (err, Lm) like the reference, + a serving-only alpha extension
    assert posterior.cache and len(posterior.cache) == 3


@pytest.mark.parametrize(
    "initial", [PrecomputeCacheType.NOCACHE, PrecomputeCacheType.TENSOR]
)
def test_sgpr_posterior_update_cache(initial):
    posterior = SGPRPosterior(
        kernel=kernels.SquaredExponential(),
        data=(X, Y),
        inducing_variable=InducingPoints(Z.copy()),
        likelihood=likelihoods.Gaussian(0.1),
        num_latent_gps=1,
        mean_function=Zero(),
        precompute_cache=initial,
    )
    posterior.update_cache(PrecomputeCacheType.VARIABLE)
    # (L, LB, c) like the reference, + a serving-only alpha extension
    assert posterior.cache and len(posterior.cache) == 4


@pytest.mark.parametrize(
    "initial", [PrecomputeCacheType.NOCACHE, PrecomputeCacheType.TENSOR]
)
def test_vgp_posterior_update_cache(initial):
    posterior = VGPPosterior(
        kernel=kernels.SquaredExponential(),
        X=X,
        q_mu=rng.randn(M, 1),
        q_sqrt=_q_sqrt("full"),
        mean_function=Zero(),
        precompute_cache=initial,
    )
    posterior.update_cache(PrecomputeCacheType.VARIABLE)
    assert posterior.cache


@pytest.mark.parametrize("q_sqrt_form", ["none", "diag", "full"])
@pytest.mark.parametrize("whiten", [True, False])
def test_update_cache_reflects_new_values(q_sqrt_form, whiten):
    """Refreshing the cache after assigning new q_mu/q_sqrt must change the
    cached (alpha, Qinv) (reference ``test_posteriors.py:737-779``)."""
    posterior = _svgp_posterior(
        q_sqrt_form, whiten, PrecomputeCacheType.TENSOR, as_parameters=True
    )
    initial_alpha, initial_Qinv = (np.asarray(c) for c in posterior.cache)

    posterior._q_dist.q_mu.assign(np.asarray(posterior.q_mu) + 1.0)
    if q_sqrt_form != "none":
        posterior._q_dist.q_sqrt.assign(np.asarray(posterior.q_sqrt) + 1.0)
    posterior.update_cache(PrecomputeCacheType.VARIABLE)

    alpha, Qinv = (np.asarray(c) for c in posterior.cache)
    assert not np.allclose(initial_alpha, alpha)
    if q_sqrt_form != "none":
        assert not np.allclose(initial_Qinv, Qinv)


@pytest.mark.parametrize("q_sqrt_form", ["none", "diag", "full"])
@pytest.mark.parametrize("whiten", [True, False])
def test_update_cache_fails_without_argument(q_sqrt_form, whiten):
    """Reference ``test_posteriors.py:782-817`` argument protocol."""
    posterior = _svgp_posterior(q_sqrt_form, whiten, None)
    assert posterior.cache is None

    with pytest.raises(ValueError):
        posterior.update_cache()

    posterior.update_cache(PrecomputeCacheType.TENSOR)
    assert posterior.cache

    posterior.update_cache(PrecomputeCacheType.NOCACHE)
    assert posterior._precompute_cache is PrecomputeCacheType.NOCACHE
    assert posterior.cache is None

    posterior.update_cache(PrecomputeCacheType.TENSOR)
    assert posterior._precompute_cache is PrecomputeCacheType.TENSOR

    posterior.cache = None  # clear behind the posterior's back
    posterior.update_cache()  # re-uses the remembered type; must not raise
    assert posterior.cache


@pytest.mark.parametrize("whiten", [True, False])
def test_create_with_variable_cache_prepopulates(whiten):
    posterior = _svgp_posterior("full", whiten, PrecomputeCacheType.VARIABLE)
    assert posterior.cache
    m, v = posterior.predict_f(rng.randn(3, D))
    assert np.asarray(m).shape == (3, 1)
    assert np.asarray(v).shape == (3, 1)


def test_string_cache_types_accepted():
    """create-time strings coerce like the reference's enum-or-str API."""
    for s in ("tensor", "variable", "nocache"):
        posterior = _svgp_posterior("full", True, s)
        if s == "nocache":
            assert posterior.cache is None
        else:
            assert posterior.cache
