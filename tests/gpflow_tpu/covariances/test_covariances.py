"""Kuu/Kuf dispatch tests incl. Multiscale and InducingPatches (pattern from
reference ``tests/gpflow/covariances``)."""
import numpy as np
import pytest

from gpflow_tpu import kernels
from gpflow_tpu.covariances import Kuf, Kuu
from gpflow_tpu.inducing_variables import InducingPatches, InducingPoints, Multiscale

rng = np.random.RandomState(0)
M, N, D = 6, 9, 2


def test_kuu_inducing_points_with_jitter():
    k = kernels.SquaredExponential()
    Z = rng.randn(M, D)
    iv = InducingPoints(Z)
    kuu = np.asarray(Kuu(iv, k, jitter=1e-3))
    expected = np.asarray(k(Z)) + 1e-3 * np.eye(M)
    np.testing.assert_allclose(kuu, expected, rtol=1e-10)


def test_kuf_inducing_points():
    k = kernels.Matern32()
    Z = rng.randn(M, D)
    X = rng.randn(N, D)
    kuf = np.asarray(Kuf(InducingPoints(Z), k, X))
    np.testing.assert_allclose(kuf, np.asarray(k(Z, X)), rtol=1e-10)


def test_multiscale_reduces_to_rbf_at_zero_scales():
    """Multiscale with scales -> 0 must approach the plain RBF covariance."""
    k = kernels.SquaredExponential(lengthscales=1.0)
    Z = rng.randn(M, D)
    X = rng.randn(N, D)
    iv = Multiscale(Z, scales=1e-8 * np.ones((M, D)))
    kuf_ms = np.asarray(Kuf(iv, k, X))
    kuf_rbf = np.asarray(Kuf(InducingPoints(Z), k, X))
    np.testing.assert_allclose(kuf_ms, kuf_rbf, rtol=1e-5, atol=1e-7)
    kuu_ms = np.asarray(Kuu(iv, k, jitter=0.0))
    kuu_rbf = np.asarray(k(Z))
    np.testing.assert_allclose(kuu_ms, kuu_rbf, rtol=1e-5, atol=1e-7)


def test_multiscale_psd():
    k = kernels.SquaredExponential()
    Z = rng.randn(M, D)
    iv = Multiscale(Z, scales=0.3 * np.ones((M, D)) + 0.1 * rng.rand(M, D))
    kuu = np.asarray(Kuu(iv, k, jitter=1e-8))
    evals = np.linalg.eigvalsh(kuu)
    assert (evals > 0).all()


def test_inducing_patches_with_convolutional():
    image_shape, patch_shape = [4, 4], [2, 2]
    base = kernels.SquaredExponential()
    k = kernels.Convolutional(base, image_shape, patch_shape)
    Zp = rng.rand(M, 4)  # patches live in patch space
    iv = InducingPatches(Zp)
    X = rng.rand(N, 16)
    kuu = np.asarray(Kuu(iv, k, jitter=1e-6))
    assert kuu.shape == (M, M)
    np.testing.assert_allclose(kuu, kuu.T, atol=1e-10)
    kuf = np.asarray(Kuf(iv, k, X))
    assert kuf.shape == (M, N)
    # oracle: weighted average of base-kernel responses over patches
    patches = np.asarray(k.get_patches(X))  # [N, P, S]
    w = np.asarray(k.weights.value)
    expected = np.zeros((M, N))
    for m in range(M):
        for n in range(N):
            r = np.exp(-0.5 * np.sum((Zp[m][None, :] - patches[n]) ** 2, -1))
            expected[m, n] = np.sum(r * w) / k.num_patches
    np.testing.assert_allclose(kuf, expected, rtol=1e-6, atol=1e-8)


def test_convolutional_svgp_trains():
    from gpflow_tpu import likelihoods
    from gpflow_tpu.models import SVGP
    from gpflow_tpu.optimizers import Scipy

    image_shape, patch_shape = [3, 3], [2, 2]
    base = kernels.SquaredExponential()
    k = kernels.Convolutional(base, image_shape, patch_shape)
    Nimg = 40
    X = rng.rand(Nimg, 9)
    # label: average intensity of the center pixel region
    Y = (X[:, 4:5] > 0.5).astype(float)
    iv = InducingPatches(np.asarray(k.get_patches(X)).reshape(-1, 4)[:10].copy())
    m = SVGP(kernel=k, likelihood=likelihoods.Bernoulli(), inducing_variable=iv, num_data=Nimg)
    before = float(m.elbo((X, Y)))
    Scipy().minimize(
        lambda: -m.elbo((X, Y)), m.trainable_variables, options={"maxiter": 30}
    )
    after = float(m.elbo((X, Y)))
    assert after > before
