"""Misc utilities (reference ``/root/reference/gpflow/utilities/misc.py``)."""
from __future__ import annotations

from typing import Any, Callable, Iterable, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..base import Module, Parameter
from ..config import default_float, default_int

__all__ = [
    "is_variable",
    "positive_parameter",
    "set_trainable",
    "to_default_float",
    "to_default_int",
    "training_loop",
]


def to_default_int(x: Any) -> jax.Array:
    return jnp.asarray(x, dtype=default_int())


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
) -> None:
    """Simple Adam training loop over a model loss closure
    (reference ``misc.py:76-109``). ``closure`` must be a bound
    ``model.training_loss``-style callable; optimization runs on the
    unconstrained leaves of ``var_list`` via optax.
    """
    import optax

    model = getattr(closure, "__self__", None)
    if model is None:
        raise ValueError("training_loop expects a bound method like model.training_loss")
    params = tuple(var_list) if var_list is not None else model.trainable_parameters
    opt = optimizer if optimizer is not None else optax.adam(learning_rate)

    leaves, treedef = jax.tree_util.tree_flatten(model)
    param_ids = [id(p.unconstrained_variable) for p in params]
    train_idx = [i for i, l in enumerate(leaves) if id(l) in param_ids]

    def loss_fn(train_leaves, all_leaves):
        all_leaves = list(all_leaves)
        for i, v in zip(train_idx, train_leaves):
            all_leaves[i] = v
        m = jax.tree_util.tree_unflatten(treedef, all_leaves)
        return m.training_loss()

    @jax.jit
    def step(train_leaves, opt_state, all_leaves):
        loss, grads = jax.value_and_grad(loss_fn)(train_leaves, all_leaves)
        updates, opt_state = opt.update(grads, opt_state, train_leaves)
        train_leaves = optax.apply_updates(train_leaves, updates)
        return train_leaves, opt_state, loss

    train_leaves = [leaves[i] for i in train_idx]
    opt_state = opt.init(train_leaves)
    for _ in range(maxiter):
        train_leaves, opt_state, _loss = step(train_leaves, opt_state, leaves)
        for i, v in zip(train_idx, train_leaves):
            leaves[i] = v
    for p, v in zip(params, (leaves[i] for i in train_idx)):
        p.assign_unconstrained(v)
