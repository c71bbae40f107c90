"""Functions and mean functions (reference ``/root/reference/gpflow/functions.py``).

Deviation (SURVEY.md A.5.3): ``SwitchedFunction`` replaces the reference's
``tf.dynamic_partition``/``dynamic_stitch`` with a static-shape masked
evaluation — every branch function is evaluated on the full batch and results
are selected per-row. This is jit/TPU-friendly (no data-dependent shapes) at
the cost of K-times the elementwise work, which is negligible for mean
functions.
"""
from __future__ import annotations

from typing import Collection, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import Module, Parameter, TensorType
from .config import default_float
from .utilities.shapes import check_shapes, inherit_check_shapes

__all__ = [
    "Additive",
    "Constant",
    "Function",
    "Identity",
    "Linear",
    "MeanFunction",
    "Polynomial",
    "Product",
    "SwitchedFunction",
    "SwitchedMeanFunction",
    "Zero",
]


class Function(Module):
    """Base function class: ``__call__(X: [batch..., D]) -> [batch..., Q]``
    (reference ``functions.py:38-64``). Also used for input-dependent
    likelihood parameters (heteroskedastic noise)."""

    @check_shapes(
        "X: [batch..., N, D]",
        "return: [batch..., N, Q]",
    )
    def __call__(self, X: TensorType) -> jax.Array:
        raise NotImplementedError("Implement the __call__ method for this mean function")

    def __add__(self, other: "Function") -> "Function":
        return Additive(self, other)

    def __mul__(self, other: "Function") -> "Function":
        return Product(self, other)


class MeanFunction(Function):
    """Mixin marking Functions appropriate as GP mean functions."""


class Additive(MeanFunction, Function):
    def __init__(self, first_part: Function, second_part: Function) -> None:
        self.add_1 = first_part
        self.add_2 = second_part

    @inherit_check_shapes
    def __call__(self, X: TensorType) -> jax.Array:
        return jnp.add(self.add_1(X), self.add_2(X))


class Product(MeanFunction, Function):
    def __init__(self, first_part: Function, second_part: Function) -> None:
        self.prod_1 = first_part
        self.prod_2 = second_part

    @inherit_check_shapes
    def __call__(self, X: TensorType) -> jax.Array:
        return jnp.multiply(self.prod_1(X), self.prod_2(X))


class Linear(MeanFunction, Function):
    """y_i = A x_i + b (reference ``functions.py:96-126``)."""

    @check_shapes(
        "A: [broadcast D, broadcast Q]",
        "b: [broadcast Q]",
    )
    def __init__(self, A: Optional[TensorType] = None, b: Optional[TensorType] = None) -> None:
        A = np.ones((1, 1), dtype=default_float()) if A is None else A
        b = np.zeros(1, dtype=default_float()) if b is None else b
        if isinstance(A, Parameter):
            if len(A.shape) < 2:
                raise ValueError("Linear mean function: A must be at least 2-dimensional")
            self.A = A
        else:
            self.A = Parameter(np.atleast_2d(np.asarray(A)), name="A")
        self.b = Parameter(b, name="b")

    @inherit_check_shapes
    def __call__(self, X: TensorType) -> jax.Array:
        return jnp.tensordot(jnp.asarray(X), self.A.value, axes=[[-1], [0]]) + self.b


class Identity(Linear, Function):
    """y_i = x_i (reference ``functions.py:129-170``)."""

    def __init__(self, input_dim: Optional[int] = None) -> None:
        self.input_dim = input_dim

    @inherit_check_shapes
    def __call__(self, X: TensorType) -> jax.Array:
        return jnp.asarray(X)

    @property
    def A(self) -> jax.Array:
        if self.input_dim is None:
            raise ValueError(
                "An input_dim needs to be specified when using the "
                "`Identity` mean function in combination with expectations."
            )
        return jnp.eye(self.input_dim, dtype=default_float())

    @property
    def b(self) -> jax.Array:
        if self.input_dim is None:
            raise ValueError(
                "An input_dim needs to be specified when using the "
                "`Identity` mean function in combination with expectations."
            )
        return jnp.zeros(self.input_dim, dtype=default_float())


class Constant(MeanFunction, Function):
    """y_i = c (reference ``functions.py:173-194``)."""

    @check_shapes(
        "c: [broadcast Q]",
    )
    def __init__(self, c: Optional[TensorType] = None) -> None:
        c = np.zeros(1) if c is None else c
        self.c = Parameter(c, name="c")

    @inherit_check_shapes
    def __call__(self, X: TensorType) -> jax.Array:
        X = jnp.asarray(X)
        c = jnp.reshape(self.c.value, (1,) * (X.ndim - 1) + (-1,))
        return jnp.broadcast_to(c, X.shape[:-1] + (c.shape[-1],))


class Zero(Constant, Function):
    """y_i = 0 (reference ``functions.py:197-204``)."""

    def __init__(self, output_dim: int = 1) -> None:
        self.output_dim = output_dim

    @inherit_check_shapes
    def __call__(self, X: TensorType) -> jax.Array:
        X = jnp.asarray(X)
        return jnp.zeros(X.shape[:-1] + (self.output_dim,), dtype=X.dtype)


class Polynomial(MeanFunction, Function):
    """Generic polynomial mean function (reference ``functions.py:207-278``)."""

    @check_shapes("w: [broadcast output_dim, broadcast n_terms]")
    def __init__(
        self,
        degree: int,
        input_dim: int = 1,
        output_dim: int = 1,
        w: Optional[TensorType] = None,
    ) -> None:
        powers = tuple(self.compute_powers(degree, input_dim))
        if w is None:
            w = [1.0] + (len(powers) - 1) * [0.0]
        w_shape = (output_dim, len(powers))
        self.degree = int(degree)
        self.powers = jnp.asarray(powers, dtype=default_float())
        self._int_powers = np.asarray(powers, dtype=np.int32)  # [n_terms, input_dim]
        self.w = Parameter(jnp.broadcast_to(jnp.asarray(w, default_float()), w_shape), name="w")

    @staticmethod
    def compute_powers(degree: int, input_dim: int) -> Sequence[Tuple[int, ...]]:
        """All non-negative integer tuples of length input_dim summing to at
        most degree, lexicographic (reference ``functions.py:228-262``)."""
        if not input_dim:
            return [()]
        result = []
        for i in range(degree + 1):
            for inner in Polynomial.compute_powers(degree - i, input_dim - 1):
                result.append((i,) + inner)
        return result

    @inherit_check_shapes
    def __call__(self, X: TensorType) -> jax.Array:
        X = jnp.asarray(X)
        # XLA lowers float pow to exp(p*log(x)), which is NaN at x<=0 (both in
        # value at 0**0 and in the x-gradient at x=0).  Integer powers are
        # built by repeated multiplication instead - exact and NaN-free.
        pows = [jnp.ones_like(X)]
        for _ in range(self.degree):
            pows.append(pows[-1] * X)
        stacked = jnp.stack(pows, axis=-2)  # [batch..., degree+1, input_dim]
        dims = np.arange(self._int_powers.shape[1])
        raised = stacked[..., self._int_powers, dims]  # [batch..., n_terms, input_dim]
        prod = jnp.prod(raised, axis=-1)  # [batch..., n_terms]
        return jnp.einsum("...i,ji->...j", prod, self.w.value)


class SwitchedFunction(MeanFunction, Function):
    """Uses a different function per data point based on the integer 'label'
    in the last column of X (reference ``functions.py:281-310``); see module
    docstring for the masked static-shape re-formulation."""

    def __init__(self, function_list: Collection[Function]) -> None:
        self.functions = list(function_list)

    @inherit_check_shapes
    def __call__(self, X: TensorType) -> jax.Array:
        X = jnp.asarray(X)
        ind = X[..., -1].astype(jnp.int32)  # [batch...]
        Xdata = X[..., :-1]
        results = jnp.stack([f(Xdata) for f in self.functions], axis=0)  # [K, batch..., Q]
        one_hot = jax.nn.one_hot(ind, len(self.functions), axis=0, dtype=results.dtype)
        # [K, batch...] -> weighted selection over K
        return jnp.sum(results * one_hot[..., None], axis=0)


class SwitchedMeanFunction(SwitchedFunction):
    """Renamed SwitchedFunction kept for backwards compatibility."""

    def __init__(self, meanfunction_list: Collection[MeanFunction]) -> None:
        super().__init__(function_list=meanfunction_list)

    @property
    def meanfunctions(self) -> Collection[MeanFunction]:
        return self.functions
