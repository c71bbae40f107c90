"""Inducing-variable behavior (pattern from reference
``tests/gpflow/test_inducing_variables.py``)."""
import numpy as np
import pytest

import gpflow_tpu
from gpflow_tpu import kernels
from gpflow_tpu.covariances import Kuf, Kuu
from gpflow_tpu.inducing_variables import (
    FallbackSeparateIndependentInducingVariables,
    FallbackSharedIndependentInducingVariables,
    InducingPatches,
    InducingPoints,
    Multiscale,
    SeparateIndependentInducingVariables,
    SharedIndependentInducingVariables,
)

rng = np.random.RandomState(4)
M, D, N = 6, 2, 9
Z = rng.randn(M, D)
X = rng.randn(N, D)


def test_inducing_points_basics():
    iv = InducingPoints(Z.copy())
    assert iv.num_inducing == M
    assert len(iv) == M
    assert iv.shape == (M, D, 1)
    assert isinstance(iv.Z, gpflow_tpu.Parameter)


def test_inducing_points_trainable_like_parameter():
    iv = InducingPoints(Z.copy())
    gpflow_tpu.set_trainable(iv, False)
    assert not iv.Z.trainable


def test_multiscale_zero_scale_limit_recovers_inducing_points():
    """With scales -> 0 Multiscale reduces to plain inducing points."""
    kernel = kernels.SquaredExponential(lengthscales=1.3)
    iv_pts = InducingPoints(Z.copy())
    iv_ms = Multiscale(Z.copy(), scales=np.full((M, D), 1e-8))
    np.testing.assert_allclose(
        np.asarray(Kuf(iv_ms, kernel, X)), np.asarray(Kuf(iv_pts, kernel, X)), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(Kuu(iv_ms, kernel, jitter=0.0)),
        np.asarray(Kuu(iv_pts, kernel, jitter=0.0)),
        atol=1e-5,
    )


def test_multiscale_kuu_psd():
    kernel = kernels.SquaredExponential()
    iv = Multiscale(Z.copy(), scales=np.abs(rng.randn(M, D)) * 0.3 + 0.1)
    K = np.asarray(Kuu(iv, kernel, jitter=1e-8))
    assert np.linalg.eigvalsh(K).min() > 0


def test_multioutput_wrappers_num_inducing():
    shared = SharedIndependentInducingVariables(InducingPoints(Z.copy()))
    sep = SeparateIndependentInducingVariables(
        [InducingPoints(Z.copy()), InducingPoints(Z.copy())]
    )
    fb_shared = FallbackSharedIndependentInducingVariables(InducingPoints(Z.copy()))
    fb_sep = FallbackSeparateIndependentInducingVariables(
        [InducingPoints(Z.copy()), InducingPoints(Z.copy())]
    )
    for iv in (shared, sep, fb_shared, fb_sep):
        assert iv.num_inducing == M


def test_inducing_patches_with_convolutional():
    image_shape = [4, 4]
    patch_shape = [2, 2]
    kernel = kernels.Convolutional(kernels.SquaredExponential(), image_shape, patch_shape)
    patches = rng.randn(M, 4)
    iv = InducingPatches(patches)
    assert iv.num_inducing == M
    Ximg = rng.randn(3, 16)
    kuf = np.asarray(Kuf(iv, kernel, Ximg))
    assert kuf.shape == (M, 3)
    kuu = np.asarray(Kuu(iv, kernel, jitter=1e-8))
    assert kuu.shape == (M, M)
    assert np.linalg.eigvalsh(kuu).min() > 0


def test_inducingpoint_wrapper_in_models():
    """Models wrap raw arrays into InducingPoints automatically."""
    m = gpflow_tpu.models.SVGP(
        kernel=kernels.SquaredExponential(),
        likelihood=gpflow_tpu.likelihoods.Gaussian(),
        inducing_variable=Z.copy(),
    )
    assert isinstance(m.inducing_variable, InducingPoints)
    assert m.inducing_variable.num_inducing == M
