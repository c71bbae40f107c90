"""Multioutput Kuu/Kuf registration grid (counterpart of reference
``tests/gpflow/covariances/test_multioutput.py``): every registered
(inducing variable x kernel) combination returns the documented shape, and
the cheap paths match their general counterparts numerically."""
import numpy as np
import pytest

from gpflow_tpu import kernels
from gpflow_tpu.covariances import Kuf, Kuu
from gpflow_tpu.inducing_variables import (
    FallbackSeparateIndependentInducingVariables,
    FallbackSharedIndependentInducingVariables,
    InducingPoints,
    SeparateIndependentInducingVariables,
    SharedIndependentInducingVariables,
)

rng = np.random.RandomState(17)
M, N, D, P, L = 5, 7, 2, 3, 3

Z = rng.randn(M, D)
X = rng.randn(N, D)
W = rng.randn(P, L)


def _sqexp_list(n):
    return [kernels.SquaredExponential(lengthscales=0.7 + 0.1 * i) for i in range(n)]


def _ip():
    return InducingPoints(Z.copy())


def _ip_list(n):
    return [InducingPoints(Z.copy() + 0.05 * i) for i in range(n)]


CASES = [
    # (iv, kernel, expected Kuu shape, expected Kuf shape)
    (InducingPoints(Z.copy()),
     kernels.SharedIndependent(kernels.SquaredExponential(), output_dim=P),
     (M, P, M, P), (M, P, N, P)),
    (SharedIndependentInducingVariables(_ip()),
     kernels.SharedIndependent(kernels.SquaredExponential(), output_dim=P),
     (M, M), (M, N)),
    (SeparateIndependentInducingVariables(_ip_list(P)),
     kernels.SharedIndependent(kernels.SquaredExponential(), output_dim=P),
     (P, M, M), (P, M, N)),
    (SharedIndependentInducingVariables(_ip()),
     kernels.SeparateIndependent(_sqexp_list(P)),
     (P, M, M), (P, M, N)),
    (SeparateIndependentInducingVariables(_ip_list(P)),
     kernels.SeparateIndependent(_sqexp_list(P)),
     (P, M, M), (P, M, N)),
    (SharedIndependentInducingVariables(_ip()),
     kernels.LinearCoregionalization(_sqexp_list(L), W=W),
     (L, M, M), (L, M, N)),
    (SeparateIndependentInducingVariables(_ip_list(L)),
     kernels.LinearCoregionalization(_sqexp_list(L), W=W),
     (L, M, M), (L, M, N)),
    (FallbackSharedIndependentInducingVariables(_ip()),
     kernels.LinearCoregionalization(_sqexp_list(L), W=W),
     (L, M, M), (M, L, N, P)),
    (FallbackSeparateIndependentInducingVariables(_ip_list(L)),
     kernels.LinearCoregionalization(_sqexp_list(L), W=W),
     (L, M, M), (M, L, N, P)),
    (FallbackSharedIndependentInducingVariables(_ip()),
     kernels.SharedIndependent(kernels.SquaredExponential(), output_dim=P),
     (M, M), None),  # Kuf unregistered for this pair in the reference too
    (FallbackSeparateIndependentInducingVariables(_ip_list(P)),
     kernels.SharedIndependent(kernels.SquaredExponential(), output_dim=P),
     (P, M, M), None),
]


@pytest.mark.parametrize(
    "iv,kernel,kuu_shape,kuf_shape", CASES,
    ids=[f"{type(c[0]).__name__}-{type(c[1]).__name__}-{i}" for i, c in enumerate(CASES)],
)
def test_registration_shapes(iv, kernel, kuu_shape, kuf_shape):
    kuu = np.asarray(Kuu(iv, kernel, jitter=1e-6))
    assert kuu.shape == kuu_shape
    if kuf_shape is not None:
        kuf = np.asarray(Kuf(iv, kernel, X))
        assert kuf.shape == kuf_shape


def test_shared_equals_separate_with_identical_components():
    """[L, M, M]/[L, M, N] stacks from the cheap shared paths must equal the
    separate paths when kernels and inducing points coincide."""
    k_shared = kernels.SharedIndependent(kernels.SquaredExponential(), output_dim=P)
    k_sep = kernels.SeparateIndependent(
        [kernels.SquaredExponential() for _ in range(P)]
    )
    iv_shared = SharedIndependentInducingVariables(_ip())
    iv_sep = SeparateIndependentInducingVariables([InducingPoints(Z.copy()) for _ in range(P)])

    a = np.asarray(Kuu(iv_sep, k_shared, jitter=1e-6))
    b = np.asarray(Kuu(iv_shared, k_sep, jitter=1e-6))
    np.testing.assert_allclose(a, b, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(Kuf(iv_sep, k_shared, X)), np.asarray(Kuf(iv_shared, k_sep, X)),
        atol=1e-12,
    )
    # each slice equals the single-output computation
    single = np.asarray(Kuu(InducingPoints(Z.copy()), kernels.SquaredExponential(), jitter=1e-6))
    for p in range(P):
        np.testing.assert_allclose(a[p], single, atol=1e-12)


def test_fallback_kuf_mixes_with_W():
    """[M, L, N, P] fallback Kuf = per-latent Kuf outer W (reference
    mo/kufs.py:118-136)."""
    ks = _sqexp_list(L)
    kernel = kernels.LinearCoregionalization(ks, W=W)
    iv_eff = SharedIndependentInducingVariables(_ip())
    iv_fb = FallbackSharedIndependentInducingVariables(_ip())
    kuf_latent = np.asarray(Kuf(iv_eff, kernel, X))  # [L, M, N]
    kuf_fb = np.asarray(Kuf(iv_fb, kernel, X))  # [M, L, N, P]
    expected = np.einsum("lmn,pl->mlnp", kuf_latent, W)
    np.testing.assert_allclose(kuf_fb, expected, atol=1e-12)


def test_generic_fully_correlated_kuu_psd():
    kernel = kernels.SharedIndependent(kernels.SquaredExponential(), output_dim=P)
    kuu = np.asarray(Kuu(_ip(), kernel, jitter=1e-6)).reshape(M * P, M * P)
    np.testing.assert_allclose(kuu, kuu.T, atol=1e-10)
    assert (np.linalg.eigvalsh(kuu) > 0).all()
