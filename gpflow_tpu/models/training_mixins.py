"""Training-loss mixins (reference ``/root/reference/gpflow/models/training_mixins.py``).

``training_loss_closure(compile=True)`` returns a callable backed by a
``jax.jit``-compiled function over the whole model pytree: parameters AND data
are traced leaves, the module structure is the static cache key, so repeated
calls never retrace (the jit analog of the reference's ``tf.function`` with
``input_signature``, reference ``training_mixins.py:109-147``).
"""
from __future__ import annotations

from typing import Any, Callable, Iterator, Tuple, TypeVar, Union

import jax
import jax.numpy as jnp

from ..base import InputData, OutputData, RegressionData
from ..utilities.shapes import check_shapes

__all__ = ["Data", "ExternalDataTrainingLossMixin", "InternalDataTrainingLossMixin"]

LossClosure = Callable[[], jax.Array]
# import-level parity with reference ``training_mixins.py:40``
Data = TypeVar("Data", RegressionData, InputData, OutputData)


class InternalDataTrainingLossMixin:
    """For models keeping their data internally (GPR, SGPR, VGP, GPMC;
    reference ``training_mixins.py:43-78``)."""

    @check_shapes("return: []")
    def training_loss(self) -> jax.Array:
        return self._training_loss()

    def training_loss_closure(self, *, compile: bool = True) -> LossClosure:
        if not compile:
            return self.training_loss

        @jax.jit
        def _loss(model: Any) -> jax.Array:
            return model._training_loss()

        return lambda: _loss(self)


class ExternalDataTrainingLossMixin:
    """For models taking minibatches (SVGP, SGPMC;
    reference ``training_mixins.py:81-147``)."""

    @check_shapes(
        "data[0]: [N, D]",
        "data[1]: [N, P]",
        "return: []",
    )
    def training_loss(self, data: RegressionData) -> jax.Array:
        return self._training_loss(data)

    def training_loss_closure(
        self,
        data: Union[RegressionData, Iterator[RegressionData]],
        *,
        compile: bool = True,
    ) -> LossClosure:
        """``data`` is either a fixed (X, Y) tuple or an iterator of
        minibatches; one compiled graph is reused for every batch of the same
        shape."""
        training_loss = self.training_loss
        if compile:

            @jax.jit
            def _loss(model: Any, batch: RegressionData) -> jax.Array:
                return model._training_loss(batch)

            training_loss = lambda batch: _loss(self, batch)  # noqa: E731

        # Dispatch on iterator-ness, not tuple-ness (reference
        # training_mixins.py checks for its DatasetOwnedIterator): a list
        # or other non-tuple (X, Y) pair is fixed data, not a minibatch
        # stream — `next()` on it would raise TypeError at first call.
        if hasattr(data, "__next__"):
            return lambda: training_loss(next(data))
        data = tuple(data)  # normalize list pairs for a stable jit cache key
        return lambda: training_loss(data)
