"""All-kernel sweeps (patterns from reference
``tests/gpflow/kernels/test_positive_semidefinite.py`` and
``tests/gpflow/kernels/test_broadcasting.py``): every concrete kernel must
produce a positive-semidefinite symmetric Gram matrix, K_diag must equal
diag(K), and batched inputs [S, N, D] must equal a per-slice loop."""
import numpy as np
import pytest

from gpflow_tpu import kernels

rng = np.random.RandomState(11)
N, D, S = 12, 3, 4


def _make_kernels():
    ks = [
        kernels.SquaredExponential(lengthscales=[0.5, 1.0, 2.0]),
        kernels.RationalQuadratic(alpha=1.3),
        kernels.Exponential(),
        kernels.Matern12(),
        kernels.Matern32(variance=1.7),
        kernels.Matern52(lengthscales=0.9),
        kernels.Cosine(lengthscales=1.5),
        kernels.Linear(variance=[0.5, 1.0, 2.0]),
        kernels.Polynomial(degree=3.0),
        kernels.White(variance=0.2),
        kernels.Constant(variance=0.4),
        kernels.Bias(),
        kernels.Periodic(kernels.SquaredExponential(), period=1.5),
        kernels.ArcCosine(order=0),
        kernels.ArcCosine(order=1),
        kernels.ArcCosine(order=2),
        kernels.SquaredExponential() + kernels.Matern32(),
        kernels.SquaredExponential() * kernels.Linear(),
    ]
    return [(type(k).__name__ + getattr(k, "_test_tag", "") + str(i), k) for i, k in enumerate(ks)]


KERNELS = _make_kernels()


@pytest.mark.parametrize("name,kernel", KERNELS, ids=[n for n, _ in KERNELS])
def test_gram_psd_symmetric_and_diag(name, kernel):
    X = rng.randn(N, D)
    K = np.asarray(kernel(X))
    assert K.shape == (N, N)
    np.testing.assert_allclose(K, K.T, atol=1e-10)
    evals = np.linalg.eigvalsh(K + 1e-9 * np.eye(N))
    assert evals.min() > -1e-8, f"{name} Gram not PSD: min eig {evals.min()}"
    Kd = np.asarray(kernel(X, full_cov=False))
    np.testing.assert_allclose(Kd, np.diag(K), atol=1e-9)


@pytest.mark.parametrize("name,kernel", KERNELS, ids=[n for n, _ in KERNELS])
def test_batched_inputs_match_loop(name, kernel):
    Xb = rng.randn(S, N, D)
    X2 = rng.randn(7, D)
    K = np.asarray(kernel(Xb, X2))
    assert K.shape == (S, N, 7)
    for s in range(S):
        np.testing.assert_allclose(K[s], np.asarray(kernel(Xb[s], X2)), atol=1e-9)
    Kd = np.asarray(kernel(Xb, full_cov=False))
    assert Kd.shape == (S, N)
    for s in range(S):
        np.testing.assert_allclose(Kd[s], np.asarray(kernel(Xb[s], full_cov=False)), atol=1e-9)


def test_coregion_psd():
    k = kernels.Coregion(output_dim=4, rank=2)
    k.kappa.assign(np.full(4, 0.3))
    X = rng.randint(0, 4, (N, 1)).astype(float)
    K = np.asarray(k(X))
    np.testing.assert_allclose(K, K.T, atol=1e-10)
    assert np.linalg.eigvalsh(K + 1e-9 * np.eye(N)).min() > -1e-8


def test_changepoints_psd():
    k = kernels.ChangePoints(
        [kernels.SquaredExponential(), kernels.Matern32()], locations=[0.0], steepness=2.0
    )
    X = rng.randn(N, 1)
    K = np.asarray(k(X))
    np.testing.assert_allclose(K, K.T, atol=1e-10)
    assert np.linalg.eigvalsh(K + 1e-9 * np.eye(N)).min() > -1e-8
