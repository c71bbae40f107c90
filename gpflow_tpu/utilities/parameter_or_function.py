"""Parameter-or-Function helper (reference
``/root/reference/gpflow/utilities/parameter_or_function.py:27-57``): lets
likelihood hyperparameters (e.g. noise variance) be either a constant
``Parameter`` or an input-dependent ``Function``.
"""
from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

from .shapes import check_shapes
from ..base import Parameter, TensorData
from ..bijectors import positive

__all__ = [
    "ConstantOrFunction",
    "ParameterOrFunction",
    "evaluate_parameter_or_function",
    "prepare_parameter_or_function",
]

ConstantOrFunction = Union[Parameter, "Function"]  # noqa: F821 - forward ref
ParameterOrFunction = Union[Parameter, "Function"]  # noqa: F821 - ref ``parameter_or_function.py:24``


def prepare_parameter_or_function(
    value: Union[TensorData, Parameter, "Function"],  # noqa: F821
    *,
    lower_bound: Optional[float] = None,
) -> ConstantOrFunction:
    from ..functions import Function

    if isinstance(value, (Function,)):
        return value
    if isinstance(value, Parameter):
        return value
    return Parameter(value, transform=positive(lower=lower_bound))


@check_shapes(
    "X: [batch..., N, D]",
    "return: [broadcast batch..., broadcast N, broadcast P]",
)
def evaluate_parameter_or_function(
    value: ConstantOrFunction,
    X: jax.Array,
    *,
    lower_bound: Optional[float] = None,
) -> jax.Array:
    from ..functions import Function

    if isinstance(value, Function):
        result = value(X)
        if lower_bound is not None:
            result = jnp.maximum(result, lower_bound)
        return result
    return jnp.asarray(value.value if isinstance(value, Parameter) else value)
