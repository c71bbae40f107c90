"""Inducing variables (reference
``/root/reference/gpflow/inducing_variables/inducing_variables.py``).

``num_inducing`` is a Python int (static under jit; the reference returns a
tf.Tensor — static shapes are the JAX-native choice and match SURVEY.md A.5.1).
"""
from __future__ import annotations

import abc
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..base import Module, Parameter, TensorData, TensorType
from ..bijectors import positive
from ..utilities.shapes import check_shapes

__all__ = ["InducingPoints", "InducingPointsBase", "InducingVariables", "Multiscale"]


class InducingVariables(Module, abc.ABC):
    """Abstract base class for inducing variables."""

    @property
    @abc.abstractmethod
    def num_inducing(self) -> int:
        raise NotImplementedError

    def __len__(self) -> int:
        return self.num_inducing

    @property
    @abc.abstractmethod
    def shape(self) -> Optional[Tuple[int, ...]]:
        """Some variation of [M, D, P] (P=1 for single-output)."""


class InducingPointsBase(InducingVariables):
    @check_shapes("Z: [M, D]")
    def __init__(self, Z: TensorData, name: Optional[str] = None):
        """:param Z: [M, D] initial positions of the inducing points
        (reference ``inducing_variables.py:64-74``)."""
        if not isinstance(Z, Parameter):
            Z = Parameter(Z, name="Z")
        self.Z = Z

    @property  # type: ignore[misc]
    @check_shapes("return: []")
    def num_inducing(self) -> int:
        return self.Z.shape[0]

    @property
    def shape(self) -> Optional[Tuple[int, ...]]:
        shape = self.Z.shape
        if not shape:
            return None
        return tuple(shape) + (1,)


class InducingPoints(InducingPointsBase):
    """Real-space inducing points (reference ``inducing_variables.py:91-94``)."""


class Multiscale(InducingPointsBase):
    """Multi-scale inducing variables (Walder et al., NIPS 2009;
    reference ``inducing_variables.py:97-126``)."""

    @check_shapes("Z: [M, D]", "scales: [M, D]")
    def __init__(self, Z: TensorData, scales: TensorData):
        super().__init__(Z)
        self.scales = Parameter(scales, transform=positive(), name="scales")

    @staticmethod
    @check_shapes("A: [N, D]", "B: [M, D]", "sc: [bcast..., M, D]", "return: [N, M]")
    def _cust_square_dist(A: TensorType, B: TensorType, sc: TensorType) -> jax.Array:
        """Squared distance with per-datapoint length scales: [N, M]
        (reference ``inducing_variables.py:113-126``)."""
        return jnp.sum(jnp.square((jnp.asarray(A)[:, None, :] - jnp.asarray(B)[None, :, :]) / sc), 2)
