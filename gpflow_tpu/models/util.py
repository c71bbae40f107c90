"""Model helper functions (reference ``/root/reference/gpflow/models/util.py``)."""
from __future__ import annotations

from typing import Any, Callable, Iterator, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..base import Module, Parameter, RegressionData
from ..config import default_float
from ..utilities.shapes import check_shapes
from ..inducing_variables import InducingPoints, InducingVariables
from .training_mixins import ExternalDataTrainingLossMixin, InternalDataTrainingLossMixin

# import-level parity with reference ``models/util.py:27-28``
InducingVariablesLike = Union[InducingVariables, jax.Array, np.ndarray]
InducingPointsLike = Union[InducingPoints, jax.Array, np.ndarray]

__all__ = [
    "data_input_to_tensor",
    "inducingpoint_wrapper",
    "maximum_log_likelihood_objective",
    "training_loss",
    "training_loss_closure",
]


def inducingpoint_wrapper(
    inducing_variable: Union[InducingVariables, jax.Array, np.ndarray]
) -> InducingVariables:
    """Wraps a raw [M, D] array into InducingPoints
    (reference ``util.py:31-38``)."""
    if not isinstance(inducing_variable, InducingVariables):
        inducing_variable = InducingPoints(inducing_variable)
    return inducing_variable


def data_input_to_tensor(structure: Any) -> Any:
    """Converts data structures to jnp arrays with default float dtype for
    floats (reference ``util.py:91-107``). Parameters pass through unchanged
    — the reference likewise preserves tensor-likes (``tf.is_tensor`` is
    true for a TransformedVariable), which is what lets GPLVM store its
    TRAINABLE latent X inside ``model.data``."""
    if isinstance(structure, Parameter):
        return structure
    if isinstance(structure, tuple):
        return tuple(data_input_to_tensor(x) for x in structure)
    if isinstance(structure, list):
        return [data_input_to_tensor(x) for x in structure]
    arr = jnp.asarray(structure)
    if jnp.issubdtype(arr.dtype, jnp.floating):
        arr = arr.astype(default_float())
    return arr


@check_shapes(
    "data[0]: [N, D]",
    "data[1]: [N, P]",
    "return: []",
)
def maximum_log_likelihood_objective(model: Module, data: RegressionData) -> jax.Array:
    """reference ``util.py:51-62``."""
    if isinstance(model, InternalDataTrainingLossMixin):
        return model.maximum_log_likelihood_objective()
    return model.maximum_log_likelihood_objective(data)


@check_shapes(
    "data[0]: [N, D]",
    "data[1]: [N, P]",
    "return: []",
)
def training_loss(model: Module, data: RegressionData) -> jax.Array:
    """reference ``util.py:65-74``."""
    if isinstance(model, InternalDataTrainingLossMixin):
        return model.training_loss()
    return model.training_loss(data)


@check_shapes(
    "data[0]: [N, D]",
    "data[1]: [N, P]",
)
def training_loss_closure(
    model: Module,
    data: Union[RegressionData, Iterator[RegressionData]],
    **closure_kwargs: Any,
) -> Callable[[], jax.Array]:
    """reference ``util.py:77-89``."""
    if isinstance(model, InternalDataTrainingLossMixin):
        return model.training_loss_closure(**closure_kwargs)
    return model.training_loss_closure(data, **closure_kwargs)
