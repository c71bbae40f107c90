"""Leading-batch-dim broadcasting through ``conditional`` (pattern from
reference ``tests/gpflow/conditionals/test_broadcasted_conditionals.py``):
``conditional(X[batch..., N, D], ...)`` must equal a Python loop over the
leading dims, for every (q_sqrt form x whiten x full_cov) combination."""
import itertools

import numpy as np
import pytest

from gpflow_tpu import kernels
from gpflow_tpu.conditionals import conditional
from gpflow_tpu.inducing_variables import InducingPoints

rng = np.random.RandomState(3)
S1, S2, N, D, M, L = 2, 3, 4, 2, 5, 3

Z = rng.randn(M, D)
X_BATCH = rng.randn(S1, S2, N, D)
Q_MU = rng.randn(M, L)
Q_SQRT_FULL = np.tril(rng.randn(L, M, M) * 0.2 + np.eye(M)[None] * 1.5)
Q_SQRT_DIAG = np.abs(rng.randn(M, L)) + 0.4


@pytest.mark.parametrize("q_sqrt_form", ["none", "diag", "full"])
@pytest.mark.parametrize("whiten", [True, False])
@pytest.mark.parametrize("full_cov", [False, True])
def test_conditional_broadcasting(q_sqrt_form, whiten, full_cov):
    q_sqrt = {"none": None, "diag": Q_SQRT_DIAG, "full": Q_SQRT_FULL}[q_sqrt_form]
    kernel = kernels.SquaredExponential(lengthscales=[0.7, 1.3])
    iv = InducingPoints(Z.copy())

    mean, var = conditional(
        X_BATCH, iv, kernel, Q_MU, q_sqrt=q_sqrt, white=whiten, full_cov=full_cov
    )
    assert mean.shape == (S1, S2, N, L)
    if full_cov:
        assert var.shape == (S1, S2, L, N, N)
    else:
        assert var.shape == (S1, S2, N, L)

    for i, j in itertools.product(range(S1), range(S2)):
        m_ij, v_ij = conditional(
            X_BATCH[i, j], iv, kernel, Q_MU, q_sqrt=q_sqrt, white=whiten, full_cov=full_cov
        )
        np.testing.assert_allclose(np.asarray(mean[i, j]), np.asarray(m_ij), atol=1e-9)
        np.testing.assert_allclose(np.asarray(var[i, j]), np.asarray(v_ij), atol=1e-9)


def test_single_leading_dim():
    kernel = kernels.Matern52()
    iv = InducingPoints(Z.copy())
    Xb = rng.randn(S1, N, D)
    mean, var = conditional(Xb, iv, kernel, Q_MU, q_sqrt=Q_SQRT_FULL, white=True)
    assert mean.shape == (S1, N, L) and var.shape == (S1, N, L)
    m0, v0 = conditional(Xb[1], iv, kernel, Q_MU, q_sqrt=Q_SQRT_FULL, white=True)
    np.testing.assert_allclose(np.asarray(mean[1]), np.asarray(m0), atol=1e-9)
    np.testing.assert_allclose(np.asarray(var[1]), np.asarray(v0), atol=1e-9)
