"""Tensor ops: pairwise distances (the kernel hot path) and helpers.

Re-implements ``/root/reference/gpflow/utilities/ops.py`` in jnp. On TPU the
``square_distance`` expansion ``|x|^2 - 2 x.x2 + |x2|^2`` maps the dominant
term onto the MXU as one batched matmul; XLA fuses the rank-1 corrections.
A Pallas tiled variant lives in ``gpflow_tpu.ops`` and is used by kernels
when enabled (see ``gpflow_tpu/ops/pallas_distance.py``).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import default_float
from .shapes import check_shapes

__all__ = [
    "broadcasting_elementwise",
    "difference_matrix",
    "eye",
    "leading_transpose",
    "pca_reduce",
    "square_distance",
]


@check_shapes(
    "value: []",
    "return: [N, N]",
)
def eye(num: int, value: jax.Array | float = 1.0, dtype: Optional[type] = None) -> jax.Array:
    """value * I_num (reference ``ops.py:27-34``)."""
    dtype = dtype or default_float()
    return jnp.asarray(value, dtype) * jnp.eye(num, dtype=dtype)


@check_shapes(
    "tensor: [any...]",
    "return: [transposed_any...]",
)
def leading_transpose(tensor: jax.Array, perm: Sequence[int], leading_dim: int = 0) -> jax.Array:
    """Transposes tensors with leading dims left unchanged
    (reference ``ops.py:37-79``). ``perm`` uses ``...`` for leading dims and
    negative indices counted from the end, e.g. ``perm=[..., -1, -2]``.

    ``leading_dim`` is accepted for signature parity; in the reference it is
    substituted for the ellipsis entry and then discarded by the final concat
    (``ops.py:72-78``), so it never affects the result there either.
    """
    del leading_dim
    perm = list(perm)
    idx = perm.index(...)
    rank = tensor.ndim
    trailing = len(perm) - 1
    lead = list(range(rank - trailing))
    pre = [p % rank for p in perm[:idx]]
    post = [p % rank for p in perm[idx + 1 :]]
    return jnp.transpose(tensor, pre + lead + post)


@check_shapes(
    "a: [a_shape...]",
    "b: [b_shape...]",
    "return: [a_shape..., b_shape...]",
)
def broadcasting_elementwise(
    op: Callable[[jax.Array, jax.Array], jax.Array], a: jax.Array, b: jax.Array
) -> jax.Array:
    """Applies binary op to all pairs: result[i, j] = op(a[i], b[j])
    (reference ``ops.py:87-102``)."""
    flatres = op(jnp.reshape(a, (-1, 1)), jnp.reshape(b, (1, -1)))
    return jnp.reshape(flatres, a.shape + b.shape)


@check_shapes(
    "X: [batch..., N, D]",
    "X2: [batch2..., N2, D]",
    "return: [batch..., N, batch2..., N2] if X2 is not None",
    "return: [batch..., N, N] if X2 is None",
)
def square_distance(X: jax.Array, X2: Optional[jax.Array]) -> jax.Array:
    """Squared pairwise distance ||x - x2||^2, batched
    (reference ``ops.py:105-128``).

    X: [..., N, D], X2: [..., M, D] or None -> [..., N, M] (or [..., N, N]).
    The X2=None path is exactly symmetric (important for Cholesky stability).
    """
    if X2 is None:
        Xs = jnp.sum(jnp.square(X), axis=-1, keepdims=True)
        dist = -2.0 * jnp.matmul(X, jnp.swapaxes(X, -1, -2))
        dist += Xs + jnp.swapaxes(Xs, -1, -2)
        return dist
    # cross-batch semantics matching the reference (``ops.py:120-127``):
    # all leading dims of X and X2 cross, via tensordot + outer-sum
    Xs = jnp.sum(jnp.square(X), axis=-1)  # [batch..., N]
    X2s = jnp.sum(jnp.square(X2), axis=-1)  # [batch2..., M]
    dist = -2.0 * jnp.tensordot(X, X2, axes=[[-1], [-1]])  # [batch..., N, batch2..., M]
    dist += broadcasting_elementwise(jnp.add, Xs, X2s)
    return dist


@check_shapes(
    "X: [batch..., N, D]",
    "X2: [batch2..., N2, D]",
    "return: [batch..., N, batch2..., N2, D] if X2 is not None",
    "return: [batch..., N, N, D] if X2 is None",
)
def difference_matrix(X: jax.Array, X2: Optional[jax.Array]) -> jax.Array:
    """Pairwise difference X[..., n, :] - X2[..., m, :] (reference
    ``ops.py:131-150``): [batch..., N, D] x [batch2..., M, D] ->
    [batch..., N, batch2..., M, D]. Like ``square_distance``, independent
    leading batch dims of X and X2 CROSS (the reference flattens both to
    2-D and reshapes); with X2=None the result is [batch..., N, N, D]."""
    if X2 is None:
        return X[..., :, None, :] - X[..., None, :, :]
    Xshape = jnp.shape(X)
    X2shape = jnp.shape(X2)
    Xf = jnp.reshape(X, (-1, Xshape[-1]))
    X2f = jnp.reshape(X2, (-1, X2shape[-1]))
    diff = Xf[:, None, :] - X2f[None, :, :]
    return jnp.reshape(diff, Xshape[:-1] + X2shape[:-1] + (Xshape[-1],))


@check_shapes(
    "X: [N, D]",
    "latent_dim: []",
    "return: [N, Q]",
)
def pca_reduce(X: jax.Array, latent_dim: int) -> jax.Array:
    """PCA projection to ``latent_dim`` (reference ``ops.py:153-174``);
    used to initialize GPLVM latents."""
    if latent_dim > X.shape[1]:
        raise ValueError("Cannot have more latent dimensions than observed")
    X_np = np.asarray(X)
    X_centered = X_np - X_np.mean(axis=0, keepdims=True)
    cov = np.cov(X_centered.T)
    evals, evecs = np.linalg.eigh(np.atleast_2d(cov))
    W = evecs[:, -latent_dim:]
    result = X_centered @ W
    return jnp.asarray(result, dtype=X.dtype if hasattr(X, "dtype") else default_float())
