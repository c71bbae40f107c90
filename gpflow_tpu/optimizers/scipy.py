"""Scipy optimizer wrapper (reference ``/root/reference/gpflow/optimizers/scipy.py``).

Same design as the reference: pack trainable Parameters' *unconstrained*
values into one flat float64 vector, hand scipy.optimize.minimize (default
L-BFGS-B) a jit-compiled value-and-grad function, unpack the optimum back
into the parameters. The host<->device boundary is one flat vector per
iteration, exactly as in the reference (``scipy.py:292-331``); the loss+grad
graph is compiled once and reused every step.

Functionalization: the user's ``closure`` reads parameters through captured
``Parameter`` objects. During tracing we temporarily swap each parameter's
unconstrained array for the traced value and restore afterwards — this makes
any closure differentiable without requiring a particular model structure.
"""
from __future__ import annotations

from typing import Any, Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.optimize

from ..base import Parameter

__all__ = ["Scipy"]

LossClosure = Callable[[], jax.Array]
StepCallback = Callable[[int, Sequence[Parameter], Sequence[np.ndarray]], None]


class Scipy:
    def minimize(
        self,
        closure: LossClosure,
        variables: Sequence[Parameter],
        method: str = "L-BFGS-B",
        step_callback: Optional[StepCallback] = None,
        compile: bool = True,
        allow_unused_variables: bool = False,
        **scipy_kwargs: Any,
    ) -> "scipy.optimize.OptimizeResult":
        """Minimizes ``closure()`` w.r.t. ``variables``
        (reference ``scipy.py:78-168``).

        :param closure: () -> scalar loss, reading the current values of
            ``variables`` (e.g. ``model.training_loss``).
        :param variables: Parameters to optimize (``model.trainable_variables``).
        :param method: scipy method, default "L-BFGS-B".
        :param step_callback: called as (step, variables, values) each iteration.
        :param compile: jit-compile the loss-and-gradient evaluation.
        :param scipy_kwargs: forwarded to scipy.optimize.minimize (e.g.
            options={"maxiter": 1000}).
        """
        if not callable(closure):
            raise TypeError("The 'closure' argument is expected to be a callable object.")
        variables = tuple(variables)
        if not all(isinstance(v, Parameter) for v in variables):
            raise TypeError("The 'variables' argument is expected to only contain Parameters.")

        initial_params = self.initial_parameters(variables)

        func = self.eval_func(
            closure,
            variables,
            compile=compile,
            allow_unused_variables=allow_unused_variables,
            step_callback=step_callback,
        )

        result = scipy.optimize.minimize(
            func, initial_params, jac=True, method=method, **scipy_kwargs
        )
        # assign the optimum back into the parameters
        _assign_from_flat(variables, result.x)
        return result

    def initial_parameters(self, variables: Sequence[Parameter]) -> np.ndarray:
        return _pack(
            [np.asarray(v.unconstrained_variable, dtype=np.float64) for v in variables]
        )

    def eval_func(
        self,
        closure: LossClosure,
        variables: Sequence[Parameter],
        compile: bool = True,
        allow_unused_variables: bool = False,
        step_callback: Optional[StepCallback] = None,
    ) -> Callable[[np.ndarray], Tuple[np.ndarray, np.ndarray]]:
        shapes = [tuple(np.shape(v.unconstrained_variable)) for v in variables]
        dtypes = [v.dtype for v in variables]

        def loss_fn(unconstrained: Tuple[jax.Array, ...]) -> jax.Array:
            originals = [v._unconstrained for v in variables]
            try:
                for v, u in zip(variables, unconstrained):
                    v._unconstrained = u
                return closure()
            finally:
                for v, o in zip(variables, originals):
                    v._unconstrained = o

        value_and_grad = jax.value_and_grad(loss_fn)
        if compile:
            value_and_grad = jax.jit(value_and_grad)

        step = [0]

        def _eval(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
            unconstrained = tuple(
                jnp.asarray(u, dtype=d)
                for u, d in zip(_unpack(x, shapes), dtypes)
            )
            loss, grads = value_and_grad(unconstrained)
            grad_arrays = [np.asarray(g, dtype=np.float64) for g in grads]
            if not allow_unused_variables:
                pass  # jax returns zero grads for unused leaves; nothing to check
            if step_callback is not None:
                values = [np.asarray(u) for u in unconstrained]
                step_callback(step[0], variables, values)
            step[0] += 1
            return np.asarray(loss, dtype=np.float64), _pack(grad_arrays)

        return _eval


def _pack(arrays: List[np.ndarray]) -> np.ndarray:
    if not arrays:
        return np.zeros((0,), dtype=np.float64)
    return np.concatenate([np.reshape(a, (-1,)) for a in arrays])


def _unpack(x: np.ndarray, shapes: Sequence[Tuple[int, ...]]) -> List[np.ndarray]:
    out = []
    i = 0
    for shape in shapes:
        size = int(np.prod(shape)) if shape else 1
        out.append(np.reshape(x[i : i + size], shape))
        i += size
    return out


def _assign_from_flat(variables: Sequence[Parameter], x: np.ndarray) -> None:
    shapes = [tuple(np.shape(v.unconstrained_variable)) for v in variables]
    for v, val in zip(variables, _unpack(np.asarray(x), shapes)):
        v.assign_unconstrained(jnp.asarray(val, dtype=v.dtype))
