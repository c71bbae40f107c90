"""Multioutput kernels (reference
``/root/reference/gpflow/kernels/multioutput/kernels.py:26-404``).

Shape semantics (P outputs, L latent GPs):
  K(X, X2, full_output_cov=True)  -> [batch..., N, P, batch2..., N2, P]
  K(X, X2, full_output_cov=False) -> [P, batch..., N, batch2..., N2]
  K_diag(X, full_output_cov=True)  -> [batch..., N, P, P]
  K_diag(X, full_output_cov=False) -> [batch..., N, P]
Note ``__call__`` defaults to full_cov=False (unlike single-output kernels).
"""
from __future__ import annotations

import abc
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ...base import Parameter, TensorType
from ...utilities.shapes import check_shapes, inherit_check_shapes
from ..base import Combination, Kernel

__all__ = [
    "IndependentLatent",
    "LinearCoregionalization",
    "MultioutputKernel",
    "SeparateIndependent",
    "SharedIndependent",
]


def _tile_output_diag(K: jax.Array, P: int, rank: int) -> jax.Array:
    """[batch..., N, (batch2...,) N2] -> [batch..., N, P, (batch2...,) N2, P]
    with the output dims on an identity (block-diagonal outputs)."""
    Kexp = jnp.expand_dims(jnp.expand_dims(K, rank), -1)
    eye = jnp.eye(P, dtype=K.dtype)
    eye_r = eye.reshape((1,) * rank + (P,) + (1,) * (K.ndim - rank) + (P,))
    return Kexp * eye_r


class MultioutputKernel(Kernel):
    """Base class (reference ``multioutput/kernels.py:26-115``)."""

    @property
    @abc.abstractmethod
    def num_latent_gps(self) -> int:
        raise NotImplementedError

    @property
    @abc.abstractmethod
    def latent_kernels(self) -> Tuple[Kernel, ...]:
        raise NotImplementedError

    @abc.abstractmethod
    @check_shapes(
        "X: [batch..., N, D]",
        "X2: [batch2..., N2, D]",
        "return: [batch..., N, P, batch2..., N2, P] if full_output_cov and (X2 is not None)",
        "return: [P, batch..., N, batch2..., N2] if not full_output_cov and (X2 is not None)",
        "return: [batch..., N, P, N, P] if full_output_cov and (X2 is None)",
        "return: [P, batch..., N, N] if not full_output_cov and (X2 is None)",
    )
    def K(
        self, X: TensorType, X2: Optional[TensorType] = None, full_output_cov: bool = True
    ) -> jax.Array:
        raise NotImplementedError

    @abc.abstractmethod
    @check_shapes(
        "X: [batch..., N, D]",
        "return: [batch..., N, P, P] if full_output_cov",
        "return: [batch..., N, P] if not full_output_cov",
    )
    def K_diag(self, X: TensorType, full_output_cov: bool = True) -> jax.Array:
        raise NotImplementedError

    @check_shapes(
        "X: [batch..., N, D]",
        "X2: [batch2..., N2, D]",
        "return: [batch..., N, P, batch2..., N2, P] if full_cov and full_output_cov and (X2 is not None)",
        "return: [P, batch..., N, batch2..., N2] if full_cov and (not full_output_cov) and (X2 is not None)",
        "return: [batch..., N, P, N, P] if full_cov and full_output_cov and (X2 is None)",
        "return: [P, batch..., N, N] if full_cov and (not full_output_cov) and (X2 is None)",
        "return: [batch..., N, P, P] if (not full_cov) and full_output_cov and (X2 is None)",
        "return: [batch..., N, P] if (not full_cov) and (not full_output_cov) and (X2 is None)",
    )
    def __call__(
        self,
        X: TensorType,
        X2: Optional[TensorType] = None,
        *,
        full_cov: bool = False,
        full_output_cov: bool = True,
        presliced: bool = False,
    ) -> jax.Array:
        if not presliced:
            X, X2 = self.slice(X, X2)
        if not full_cov and X2 is not None:
            raise ValueError(
                "Ambiguous inputs: passing in `X2` is not compatible with `full_cov=False`."
            )
        if not full_cov:
            return self.K_diag(X, full_output_cov=full_output_cov)
        return self.K(X, X2, full_output_cov=full_output_cov)


class SharedIndependent(MultioutputKernel):
    """Same kernel for each of P independent outputs
    (reference ``multioutput/kernels.py:118-197``)."""

    def __init__(self, kernel: Kernel, output_dim: int) -> None:
        super().__init__()
        self.kernel = kernel
        self.output_dim = output_dim

    @property
    def num_latent_gps(self) -> int:
        return self.output_dim

    @property
    def latent_kernels(self) -> Tuple[Kernel, ...]:
        return (self.kernel,)

    @inherit_check_shapes
    def K(
        self, X: TensorType, X2: Optional[TensorType] = None, full_output_cov: bool = True
    ) -> jax.Array:
        K = self.kernel.K(X, X2)
        rank = jnp.asarray(X).ndim - 1
        if full_output_cov:
            return _tile_output_diag(K, self.output_dim, rank)
        return jnp.broadcast_to(K[None, ...], (self.output_dim,) + K.shape)

    @inherit_check_shapes
    def K_diag(self, X: TensorType, full_output_cov: bool = True) -> jax.Array:
        K = self.kernel.K_diag(X)  # [batch..., N]
        Ks = jnp.broadcast_to(K[..., None], K.shape + (self.output_dim,))
        if full_output_cov:
            return Ks[..., :, None] * jnp.eye(self.output_dim, dtype=K.dtype)
        return Ks


class SeparateIndependent(MultioutputKernel, Combination):
    """One kernel per independent output
    (reference ``multioutput/kernels.py:200-271``)."""

    def __init__(self, kernels: Sequence[Kernel], name: Optional[str] = None) -> None:
        Combination.__init__(self, kernels=kernels, name=name)

    @property
    def num_latent_gps(self) -> int:
        return len(self.kernels)

    @property
    def latent_kernels(self) -> Tuple[Kernel, ...]:
        return tuple(self.kernels)

    @inherit_check_shapes
    def K(
        self, X: TensorType, X2: Optional[TensorType] = None, full_output_cov: bool = True
    ) -> jax.Array:
        rank = jnp.asarray(X).ndim - 1
        Ks = jnp.stack([k.K(X, X2) for k in self.kernels], axis=0)  # [P, ...]
        if not full_output_cov:
            return Ks
        P = len(self.kernels)
        # [batch..., N, P, (batch2...,) N2, P] block-diagonal over outputs
        K0 = Ks[0]
        Kexp = jnp.expand_dims(jnp.moveaxis(Ks, 0, rank), -1)
        # Kexp: [batch..., N, P, (batch2...,) N2, 1]
        eye = jnp.eye(P, dtype=K0.dtype).reshape(
            (1,) * rank + (P,) + (1,) * (K0.ndim - rank) + (P,)
        )
        return Kexp * eye

    @inherit_check_shapes
    def K_diag(self, X: TensorType, full_output_cov: bool = False) -> jax.Array:
        stacked = jnp.stack([k.K_diag(X) for k in self.kernels], axis=-1)  # [batch..., N, P]
        if full_output_cov:
            return stacked[..., :, None] * jnp.eye(len(self.kernels), dtype=stacked.dtype)
        return stacked


class IndependentLatent(MultioutputKernel):
    """Kernels built from independent latent GPs; must expose a block-diagonal
    latent covariance ``Kgg`` [L, batch..., N, batch2..., N2]
    (reference ``multioutput/kernels.py:274-295``)."""

    @abc.abstractmethod
    @check_shapes(
        "X: [batch..., N, D]",
        "X2: [batch2..., N2, D]",
        "return: [L, batch..., N, batch2..., N2]",
    )
    def Kgg(self, X: TensorType, X2: TensorType) -> jax.Array:
        raise NotImplementedError


class LinearCoregionalization(IndependentLatent, Combination):
    """f = W g: linear mixing of L latent GPs into P outputs, W: [P, L]
    (reference ``multioutput/kernels.py:298-404``)."""

    def __init__(self, kernels: Sequence[Kernel], W: TensorType, name: Optional[str] = None):
        Combination.__init__(self, kernels=kernels, name=name)
        self.W = Parameter(W, name="W")

    @property
    def num_latent_gps(self) -> int:
        return self.W.shape[-1]

    @property
    def latent_kernels(self) -> Tuple[Kernel, ...]:
        return tuple(self.kernels)

    @inherit_check_shapes
    def Kgg(self, X: TensorType, X2: TensorType) -> jax.Array:
        return jnp.stack([k.K(X, X2) for k in self.kernels], axis=0)

    @inherit_check_shapes
    def K(
        self, X: TensorType, X2: Optional[TensorType] = None, full_output_cov: bool = True
    ) -> jax.Array:
        Kxx = self.Kgg(X, X2)  # [L, batch..., N, (batch2...,) N2]
        W = self.W.value  # [P, L]
        rank = jnp.asarray(X).ndim - 1
        P, L = W.shape
        ones = (1,) * (Kxx.ndim - 1)
        W_broadcast = W.reshape((P, L) + ones)
        KxxW = Kxx[None, ...] * W_broadcast  # [P, L, batch..., N, (batch2...,) N2]
        if not full_output_cov:
            # sum_l W[p,l]^2 Kxx[l] -> [P, batch..., N, (batch2...,) N2]
            return jnp.sum(W_broadcast * KxxW, axis=1)
        WKxxW = jnp.tensordot(W, KxxW, axes=[[1], [1]])  # [P, P, batch..., N, (b2...,) N2]
        if X2 is None:
            # -> [batch..., N, P, N, P]
            perm = tuple(range(2, 2 + rank)) + (0, 2 + rank, 1)
        else:
            rank2 = jnp.asarray(X2).ndim - 1
            perm = tuple(range(2, 2 + rank)) + (0,) + tuple(2 + rank + i for i in range(rank2)) + (1,)
        return jnp.transpose(WKxxW, perm)

    @inherit_check_shapes
    def K_diag(self, X: TensorType, full_output_cov: bool = True) -> jax.Array:
        K = jnp.stack([k.K_diag(X) for k in self.kernels], axis=-1)  # [batch..., N, L]
        W = self.W.value
        if full_output_cov:
            # [batch..., N, P, P] = sum_l K[...,l] W[p,l] W[q,l]
            return jnp.einsum("...l,pl,ql->...pq", K, W, W)
        # [batch..., N, P]
        return jnp.matmul(K, (W ** 2.0).T)
