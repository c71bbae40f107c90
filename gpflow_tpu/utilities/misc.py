"""Misc utilities (reference ``/root/reference/gpflow/utilities/misc.py``)."""
from __future__ import annotations

from typing import Any, Callable, Iterable, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..base import Module, Parameter, functionalize
from ..config import default_float, default_int
from .shapes import check_shapes

__all__ = [
    "is_variable",
    "positive_parameter",
    "set_trainable",
    "to_default_float",
    "to_default_int",
    "training_loop",
]


@check_shapes(
    "x: [any...]",
    "return: [any...]",
)
def to_default_int(x: Any) -> jax.Array:
    return jnp.asarray(x, dtype=default_int())


@check_shapes(
    "x: [any...]",
    "return: [any...]",
)
def to_default_float(x: Any) -> jax.Array:
    return jnp.asarray(x, dtype=default_float())


def set_trainable(model: Union[Module, Parameter, Iterable[Union[Module, Parameter]]], flag: bool) -> None:
    """Sets trainability of all parameters under ``model``
    (reference ``misc.py:57-73``)."""
    if isinstance(model, Parameter):
        model.trainable = flag
        return
    if isinstance(model, Module):
        for p in model.parameters:
            p.trainable = flag
        return
    for m in model:
        set_trainable(m, flag)


def is_variable(t: Any) -> bool:
    """True if ``t`` is a trainable state object (reference ``misc.py:69-73``
    checks for tf.Variable; here that role is played by Parameter)."""
    return isinstance(t, Parameter)


def positive_parameter(value: Any) -> Parameter:
    from ..bijectors import positive

    if isinstance(value, Parameter):
        return value
    return Parameter(value, transform=positive())


def training_loop(
    closure: Callable[[], jax.Array],
    optimizer: Optional[Any] = None,
    var_list: Optional[Iterable[Parameter]] = None,
    maxiter: int = 1000,
    compile: bool = False,
    learning_rate: float = 0.01,
    use_scan: bool = False,
) -> jax.Array:
    """Simple Adam training loop over a loss closure
    (reference ``misc.py:76-109``). ``closure`` is any zero-argument callable
    returning the loss and reading the current values of ``var_list`` (e.g.
    ``model.training_loss``, ``model.training_loss_closure(data)``, or a
    lambda). ``var_list`` defaults to the closure's bound object's trainable
    parameters when the closure is a bound method.

    ``use_scan=True`` runs all ``maxiter`` steps device-resident in ONE
    compiled ``lax.scan`` dispatch; on a tunneled TPU this removes the two
    host round-trips the per-step loop pays every iteration. (No reference
    counterpart — the reference's loop is eager per step, ``misc.py:76-109``.)

    Both paths return the per-step loss history ([maxiter], the loss BEFORE
    each update). The scan path is always jitted as a whole, so
    ``compile=True`` is redundant there and ``compile=False`` cannot be
    honored — passing ``compile=True`` together with ``use_scan=True``
    raises to keep the contract unambiguous.
    """
    import optax

    if var_list is not None:
        params = tuple(var_list)
    else:
        model = getattr(closure, "__self__", None)
        if model is None:
            raise ValueError(
                "training_loop needs `var_list` when `closure` is not a bound "
                "method (it cannot infer which parameters to optimize)"
            )
        params = tuple(model.trainable_parameters)
    opt = optimizer if optimizer is not None else optax.adam(learning_rate)

    value_and_grad = jax.value_and_grad(functionalize(closure, params))

    unconstrained = tuple(p._unconstrained for p in params)
    opt_state = opt.init(unconstrained)

    if use_scan and compile:
        raise ValueError(
            "training_loop(use_scan=True) always jits the whole scan; "
            "`compile` does not apply — pass compile=False (the default)"
        )

    if use_scan:
        def step(carry, _):
            unc, state = carry
            loss, grads = value_and_grad(unc)
            updates, state = opt.update(grads, state, unc)
            return (optax.apply_updates(unc, updates), state), loss

        @jax.jit
        def run(unc, state):
            return jax.lax.scan(step, (unc, state), xs=None, length=maxiter)

        (unconstrained, _), losses = run(unconstrained, opt_state)
        for p, u in zip(params, unconstrained):
            p.assign_unconstrained(u)
        return losses

    if compile:
        value_and_grad = jax.jit(value_and_grad)

    @jax.jit
    def apply(unconstrained, grads, opt_state):
        updates, opt_state = opt.update(grads, opt_state, unconstrained)
        return optax.apply_updates(unconstrained, updates), opt_state

    losses = []
    for _ in range(maxiter):
        loss, grads = value_and_grad(unconstrained)
        losses.append(loss)
        unconstrained, opt_state = apply(unconstrained, grads, opt_state)
    for p, u in zip(params, unconstrained):
        p.assign_unconstrained(u)
    return jnp.stack(losses) if losses else jnp.zeros((0,))
