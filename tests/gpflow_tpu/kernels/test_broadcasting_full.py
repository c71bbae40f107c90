"""Full kernel broadcasting sweep (reference
``tests/gpflow/kernels/test_broadcasting.py``): EVERY kernel class must
broadcast over independent leading batch shapes on X and X2 —
K(X[b..., N, D], X2[b2..., N2, D]) == [b..., N, b2..., N2] matching an
explicit per-slice loop — plus the no-kernel-missed meta-test (``:81-90``)."""
from typing import Any

import numpy as np
import pytest

import gpflow_tpu.ci_utils
from gpflow_tpu import kernels

rng = np.random.RandomState(20)


def create_kernels():
    return [
        kernels.White(),
        kernels.Constant(),
        kernels.SquaredExponential(),
        kernels.RationalQuadratic(),
        kernels.Exponential(),
        kernels.Matern12(),
        kernels.Matern32(),
        kernels.Matern52(),
        kernels.White() + kernels.Matern12(),
        kernels.White() * kernels.Matern12(),
        kernels.Matern32(active_dims=slice(None, None, 2)),
        kernels.Matern32(active_dims=[1, 2]),
        kernels.Cosine(),
        kernels.Linear(),
        kernels.Polynomial(),
        kernels.Periodic(kernels.Matern32()),
        kernels.ChangePoints([kernels.Matern32(), kernels.Matern32()], [0.5]),
        kernels.ArcCosine(),
        kernels.Coregion(output_dim=5, rank=2),
        kernels.Convolutional(kernels.Matern32(), [4, 4], [2, 2]),
        kernels.SharedIndependent(kernels.Matern32(), output_dim=5),
        kernels.SeparateIndependent([kernels.Matern32() for _ in range(5)]),
        kernels.LinearCoregionalization(
            [kernels.Matern32() for _ in range(3)], np.ones((5, 3))
        ),
        kernels.Categorical(
            non_categorical_kernel=kernels.RBF(lengthscales=0.1),
            categorical_kernel=kernels.RBF(lengthscales=0.1),
            num_labels=3,
        ),
    ]


def make_id(value: Any) -> str:
    if isinstance(value, tuple):
        return f"[{','.join(repr(x) for x in value)}]"
    return value.__class__.__name__


def test_no_kernels_missed():
    """Every concrete Kernel class must appear (possibly as a base) in the
    broadcast sweep (reference ``test_broadcasting.py:81-90``)."""
    tested = {
        parent
        for kernel in create_kernels()
        for parent in kernel.__class__.__mro__
        if parent is not kernels.Kernel and issubclass(parent, kernels.Kernel)
    }
    all_classes = set(gpflow_tpu.ci_utils.subclasses(kernels.Kernel))
    assert tested == all_classes, f"untested kernels: {all_classes - tested}"


def unroll_batches(f, x, value_rank):
    if x.ndim == value_rank:
        return np.asarray(f(x))
    return np.stack([unroll_batches(f, row, value_rank) for row in x])


def _inputs(kernel, batch_shape, batch2_shape):
    if isinstance(kernel, kernels.Coregion):
        D = 1
        X = rng.choice(kernel.rank, batch_shape + (D,)).astype(float)
        X2 = rng.choice(kernel.rank, batch2_shape + (D,)).astype(float)
    elif isinstance(kernel, kernels.Categorical):
        D = 2
        X = np.concatenate(
            [rng.rand(*batch_shape, 1), rng.choice(3, batch_shape + (1,)).astype(float)],
            axis=-1,
        )
        X2 = np.concatenate(
            [rng.rand(*batch2_shape, 1), rng.choice(3, batch2_shape + (1,)).astype(float)],
            axis=-1,
        )
    else:
        if isinstance(kernel, kernels.ChangePoints):
            D = 1
        elif isinstance(kernel, kernels.Convolutional):
            D = int(np.prod(kernel.image_shape))
        else:
            D = 4
        X = rng.rand(*(batch_shape + (D,)))
        X2 = rng.rand(*(batch2_shape + (D,)))
    return X, X2


@pytest.mark.parametrize("kernel", create_kernels(), ids=make_id)
@pytest.mark.parametrize("batch_shape", [(3,), (2, 3)], ids=repr)
@pytest.mark.parametrize("batch2_shape", [(4,), (2, 4)], ids=repr)
def test_broadcasting(kernel, batch_shape, batch2_shape):
    X, X2 = _inputs(kernel, batch_shape + (5,), batch2_shape + (4,))
    # shapes: X [batch..., N=5, D], X2 [batch2..., N2=4, D]
    rank = len(batch_shape)
    rank2 = len(batch2_shape)

    if isinstance(kernel, kernels.MultioutputKernel):
        # cross-cov [P, batch..., N, batch2..., N2]
        loop = unroll_batches(
            lambda x: unroll_batches(
                lambda x2: kernel(x, x2, full_cov=True, full_output_cov=False), X2, 2
            ),
            X,
            2,
        )  # [batch..., batch2..., P, N, N2]
        P_axis = rank + rank2
        perm = (
            [P_axis]
            + list(range(rank))
            + [P_axis + 1]
            + list(range(rank, rank + rank2))
            + [P_axis + 2]
        )
        loop = np.transpose(loop, perm)
        native = np.asarray(kernel(X, X2, full_cov=True, full_output_cov=False))
        np.testing.assert_allclose(loop, native, atol=1e-9)

        # marginals [batch..., N, P]
        loop_d = unroll_batches(
            lambda x: kernel(x, full_cov=False, full_output_cov=False), X, 2
        )
        native_d = np.asarray(kernel(X, full_cov=False, full_output_cov=False))
        np.testing.assert_allclose(loop_d, native_d, atol=1e-9)

        # full joint [batch..., N, P, N, P]
        loop_f = unroll_batches(
            lambda x: kernel(x, full_cov=True, full_output_cov=True), X, 2
        )
        native_f = np.asarray(kernel(X, full_cov=True, full_output_cov=True))
        np.testing.assert_allclose(loop_f, native_f, atol=1e-9)
    else:
        loop = unroll_batches(
            lambda x: unroll_batches(lambda x2: kernel(x, x2, full_cov=True), X2, 2),
            X,
            2,
        )  # [batch..., batch2..., N, N2]
        perm = (
            list(range(rank))
            + [rank + rank2]
            + list(range(rank, rank + rank2))
            + [rank + rank2 + 1]
        )
        loop = np.transpose(loop, perm)  # [batch..., N, batch2..., N2]
        native = np.asarray(kernel(X, X2, full_cov=True))
        np.testing.assert_allclose(loop, native, atol=1e-9)

        loop_g = unroll_batches(lambda x: kernel(x, full_cov=True), X, 2)
        np.testing.assert_allclose(
            loop_g, np.asarray(kernel(X, full_cov=True)), atol=1e-9
        )

        loop_d = unroll_batches(lambda x: kernel(x, full_cov=False), X, 2)
        np.testing.assert_allclose(
            loop_d, np.asarray(kernel(X, full_cov=False)), atol=1e-9
        )
