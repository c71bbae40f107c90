"""Kernel base machinery (reference ``/root/reference/gpflow/kernels/base.py``).

Broadcasting semantics over leading batch dims follow the reference
(``kernels/__init__.py:9-15``): ``K(X:[batch..., N, D], X2:[batch2..., M, D])
-> [batch..., N, batch2..., M]``; ``K_diag(X:[batch..., N, D]) -> [batch..., N]``.

active_dims is stored as a slice or a tuple of ints — static pytree aux data,
so kernels never retrace on it.
"""
from __future__ import annotations

import abc
from functools import reduce
from typing import Callable, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..base import Module, Parameter, TensorType
from ..utilities.shapes import check_shapes, inherit_check_shapes

__all__ = [
    "ActiveDims",
    "Combination",
    "Kernel",
    "Product",
    "ReducingCombination",
    "Sum",
]

ActiveDims = Union[slice, Sequence[int]]
NormalizedActiveDims = Union[slice, Tuple[int, ...]]


class Kernel(Module, metaclass=abc.ABCMeta):
    """The basic kernel class; manages active dimensions
    (reference ``kernels/base.py:29-220``)."""

    def __init__(
        self, active_dims: Optional[ActiveDims] = None, name: Optional[str] = None
    ) -> None:
        self._active_dims = self._normalize_active_dims(active_dims)
        if name is not None:
            self._name = name

    @staticmethod
    def _normalize_active_dims(value: Optional[ActiveDims]) -> NormalizedActiveDims:
        if value is None:
            return slice(None, None, None)
        if isinstance(value, slice):
            return value
        return tuple(int(v) for v in np.asarray(value, dtype=int).reshape(-1))

    @property
    def active_dims(self) -> NormalizedActiveDims:
        return self._active_dims

    @active_dims.setter
    def active_dims(self, value: ActiveDims) -> None:
        self._active_dims = self._normalize_active_dims(value)

    def on_separate_dims(self, other: "Kernel") -> bool:
        """True if the two kernels act on provably disjoint dimensions
        (reference ``base.py:60-75``; conservative for slices)."""
        if isinstance(self.active_dims, slice) or isinstance(other.active_dims, slice):
            return False
        return not bool(set(self.active_dims) & set(other.active_dims))

    @check_shapes(
        "X: [batch..., N, D]",
        "X2: [batch2..., N2, D]",
        "return[0]: [batch..., N, I]",
        "return[1]: [batch2..., N2, I]",
    )
    def slice(
        self, X: TensorType, X2: Optional[TensorType] = None
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        """Selects ``active_dims`` columns (reference ``base.py:90-109``)."""
        dims = self.active_dims
        X = jnp.asarray(X)
        if isinstance(dims, slice):
            X = X[..., dims]
            if X2 is not None:
                X2 = jnp.asarray(X2)[..., dims]
        else:
            idx = jnp.asarray(dims)
            X = jnp.take(X, idx, axis=-1)
            if X2 is not None:
                X2 = jnp.take(jnp.asarray(X2), idx, axis=-1)
        return X, X2

    def slice_cov(self, cov: TensorType) -> jax.Array:
        """Slices rows+columns of covariance matrices; expands flattened
        diagonals to full matrices (reference ``base.py:115-147``)."""
        cov = jnp.asarray(cov)
        if cov.ndim == 2:
            cov = jax.vmap(jnp.diag)(cov)
        dims = self.active_dims
        if isinstance(dims, slice):
            return cov[..., dims, dims]
        idx = jnp.asarray(dims)
        cov = jnp.take(cov, idx, axis=-1)
        cov = jnp.take(cov, idx, axis=-2)
        return cov

    @check_shapes(
        "ard_parameter: [any...]",
    )
    def _validate_ard_active_dims(self, ard_parameter: Parameter) -> None:
        """reference ``base.py:152-168``."""
        if isinstance(self.active_dims, slice):
            return
        shape = ard_parameter.shape
        if len(shape) > 0 and shape[0] != len(self.active_dims):
            raise ValueError(
                f"Size of `active_dims` {self.active_dims} does not match "
                f"size of ard parameter ({shape[0]})"
            )

    @abc.abstractmethod
    @check_shapes(
        "X: [batch..., N, D]",
        "X2: [batch2..., N2, D]",
        "return: [batch..., N, batch2..., N2] if X2 is not None",
        "return: [batch..., N, N] if X2 is None",
    )
    def K(self, X: TensorType, X2: Optional[TensorType] = None) -> jax.Array:
        raise NotImplementedError

    @abc.abstractmethod
    @check_shapes(
        "X: [batch..., N, D]",
        "return: [batch..., N]",
    )
    def K_diag(self, X: TensorType) -> jax.Array:
        raise NotImplementedError

    @check_shapes(
        "X: [batch..., N, D]",
        "X2: [batch2..., N2, D]",
        "return: [batch..., N, batch2..., N2] if full_cov and (X2 is not None)",
        "return: [batch..., N, N] if full_cov and (X2 is None)",
        "return: [batch..., N] if not full_cov",
    )
    def __call__(
        self,
        X: TensorType,
        X2: Optional[TensorType] = None,
        *,
        full_cov: bool = True,
        presliced: bool = False,
    ) -> jax.Array:
        if (not full_cov) and (X2 is not None):
            raise ValueError("Ambiguous inputs: `not full_cov` and `X2` are not compatible.")
        if not presliced:
            X, X2 = self.slice(X, X2)
        if not full_cov:
            return self.K_diag(X)
        return self.K(X, X2)

    def __add__(self, other: "Kernel") -> "Kernel":
        return Sum([self, other])

    def __mul__(self, other: "Kernel") -> "Kernel":
        return Product([self, other])


class Combination(Kernel):
    """Combines a list of kernels; nested same-type combinations are flattened
    (reference ``base.py:223-277``)."""

    _reduction = None

    def __init__(self, kernels: Sequence[Kernel], name: Optional[str] = None) -> None:
        super().__init__(name=name)
        if not all(isinstance(k, Kernel) for k in kernels):
            raise TypeError("can only combine Kernel instances")
        self._set_kernels(kernels)

    def _set_kernels(self, kernels: Sequence[Kernel]) -> None:
        kernels_list: List[Kernel] = []
        for k in kernels:
            if isinstance(k, self.__class__):
                kernels_list.extend(k.kernels)
            else:
                kernels_list.append(k)
        self.kernels = kernels_list

    @property
    def on_separate_dimensions(self) -> bool:
        if any(isinstance(k.active_dims, slice) for k in self.kernels):
            return False
        dimlist = [set(k.active_dims) for k in self.kernels]
        for i, dims_i in enumerate(dimlist):
            for dims_j in dimlist[i + 1 :]:
                if dims_i & dims_j:
                    return False
        return True


class ReducingCombination(Combination):
    # NOTE deliberately NOT @inherit_check_shapes (matches the reference,
    # base.py:280-314): a Sum/Product may combine MULTIOUTPUT kernels whose
    # return shapes ([N, P, N, P]) differ from the single-output contract
    def __call__(
        self,
        X: TensorType,
        X2: Optional[TensorType] = None,
        *,
        full_cov: bool = True,
        presliced: bool = False,
    ) -> jax.Array:
        return self._reduce(
            [k(X, X2, full_cov=full_cov, presliced=presliced) for k in self.kernels]
        )

    def K(self, X: TensorType, X2: Optional[TensorType] = None) -> jax.Array:
        return self._reduce([k.K(X, X2) for k in self.kernels])

    def K_diag(self, X: TensorType) -> jax.Array:
        return self._reduce([k.K_diag(X) for k in self.kernels])

    @property
    @abc.abstractmethod
    def _reduce(self) -> Callable[[Sequence[jax.Array]], jax.Array]:
        pass


class Sum(ReducingCombination):
    @property
    def _reduce(self) -> Callable[[Sequence[jax.Array]], jax.Array]:
        return lambda ks: reduce(jnp.add, ks)


class Product(ReducingCombination):
    @property
    def _reduce(self) -> Callable[[Sequence[jax.Array]], jax.Array]:
        return lambda ks: reduce(jnp.multiply, ks)
