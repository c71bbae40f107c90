"""Scipy pack/unpack/assign static helpers (reference ``optimizers/scipy.py:292-319``)."""
import numpy as np
import pytest

import gpflow_tpu as gpf
from gpflow_tpu.optimizers import Scipy


def test_pack_unpack_assign_roundtrip():
    k = gpf.kernels.SquaredExponential(lengthscales=[1.0, 2.0, 3.0])
    params = list(k.trainable_parameters)

    vec = Scipy.pack_tensors(params)
    assert vec.ndim == 1 and vec.size == sum(
        max(int(np.prod(np.shape(p.unconstrained_variable))), 1) for p in params
    )

    parts = Scipy.unpack_tensors(params, vec)
    for p, a in zip(params, parts):
        np.testing.assert_allclose(a, np.asarray(p.unconstrained_variable), rtol=1e-6)

    new_vec = np.arange(vec.size, dtype=np.float64)
    Scipy.assign_tensors(params, Scipy.unpack_tensors(params, new_vec))
    np.testing.assert_allclose(Scipy.pack_tensors(params), new_vec, rtol=1e-6)


def test_pack_plain_arrays_and_empty():
    vec = Scipy.pack_tensors([np.ones((2, 2)), np.zeros(3)])
    assert vec.shape == (7,)
    assert Scipy.pack_tensors([]).shape == (0,)


def test_assign_length_mismatch_raises():
    k = gpf.kernels.SquaredExponential()
    with pytest.raises(ValueError, match="same length"):
        Scipy.assign_tensors(list(k.trainable_parameters), [np.zeros(1)] * 5)
