"""Multioutput kernel shape/value tests (pattern from reference
``tests/gpflow/kernels/test_multioutput.py``)."""
import numpy as np
import pytest

from gpflow_tpu import kernels

rng = np.random.RandomState(1)
N, N2, D, P, L = 6, 4, 2, 3, 2


def _X(n=N):
    return rng.randn(n, D)


def test_shared_independent_shapes_and_values():
    base = kernels.SquaredExponential()
    k = kernels.SharedIndependent(base, output_dim=P)
    X, X2 = _X(), _X(N2)
    Kbase = np.asarray(base(X))

    K_fo = np.asarray(k.K(X, full_output_cov=True))
    assert K_fo.shape == (N, P, N, P)
    K_no = np.asarray(k.K(X, full_output_cov=False))
    assert K_no.shape == (P, N, N)
    for p in range(P):
        np.testing.assert_allclose(K_no[p], Kbase, rtol=1e-12)
        np.testing.assert_allclose(K_fo[:, p, :, p], Kbase, rtol=1e-12)
    for p in range(P):
        for q in range(P):
            if p != q:
                np.testing.assert_allclose(K_fo[:, p, :, q], 0.0)

    K_cross = np.asarray(k.K(X, X2, full_output_cov=False))
    assert K_cross.shape == (P, N, N2)

    Kd = np.asarray(k.K_diag(X, full_output_cov=False))
    assert Kd.shape == (N, P)
    Kd_fo = np.asarray(k.K_diag(X, full_output_cov=True))
    assert Kd_fo.shape == (N, P, P)
    np.testing.assert_allclose(Kd_fo[:, np.arange(P), np.arange(P)], Kd, rtol=1e-12)


def test_separate_independent():
    ks = [kernels.SquaredExponential(lengthscales=0.5 + i) for i in range(P)]
    k = kernels.SeparateIndependent(ks)
    X = _X()
    K_no = np.asarray(k.K(X, full_output_cov=False))
    for p in range(P):
        np.testing.assert_allclose(K_no[p], np.asarray(ks[p](X)), rtol=1e-12)
    K_fo = np.asarray(k.K(X, full_output_cov=True))
    for p in range(P):
        np.testing.assert_allclose(K_fo[:, p, :, p], K_no[p], rtol=1e-12)
    assert k.num_latent_gps == P


def test_linear_coregionalization():
    ks = [kernels.SquaredExponential(lengthscales=0.5 + i) for i in range(L)]
    W = rng.randn(P, L)
    k = kernels.LinearCoregionalization(ks, W=W)
    X = _X()
    Kgg = np.stack([np.asarray(kk(X)) for kk in ks])  # [L, N, N]
    expected_fo = np.einsum("lnm,pl,ql->npmq", Kgg, W, W)
    K_fo = np.asarray(k.K(X, full_output_cov=True))
    np.testing.assert_allclose(K_fo, expected_fo, rtol=1e-10)
    K_no = np.asarray(k.K(X, full_output_cov=False))
    expected_no = np.einsum("lnm,pl,pl->pnm", Kgg, W, W)
    np.testing.assert_allclose(K_no, expected_no, rtol=1e-10)

    Kdiag = np.stack([np.asarray(kk(X, full_cov=False)) for kk in ks], axis=-1)  # [N, L]
    np.testing.assert_allclose(
        np.asarray(k.K_diag(X, full_output_cov=True)),
        np.einsum("nl,pl,ql->npq", Kdiag, W, W),
        rtol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(k.K_diag(X, full_output_cov=False)),
        Kdiag @ (W ** 2).T,
        rtol=1e-10,
    )
    assert k.num_latent_gps == L


def test_multioutput_call_defaults_to_diag():
    k = kernels.SharedIndependent(kernels.SquaredExponential(), output_dim=P)
    X = _X()
    assert np.asarray(k(X)).shape == (N, P, P)
    assert np.asarray(k(X, full_output_cov=False)).shape == (N, P)
    with pytest.raises(ValueError):
        k(X, _X(N2))
