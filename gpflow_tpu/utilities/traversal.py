"""Module-tree traversal, summaries, and save/load dict utilities.

Re-implements ``/root/reference/gpflow/utilities/traversal.py`` for the pytree
Module system: ``traverse_module`` (ref ``traversal.py:280-323``),
``leaf_components``/``parameter_dict`` (``:70-92,145``), ``multiple_assign``
(``:52-62``), ``read_values`` (``:65-67``), ``print_summary`` (``:95-142``),
``deepcopy``/``freeze`` (``:254-277``), ``select_dict_parameters_with_prior``
(``:356``).
"""
from __future__ import annotations

import copy as _copy
from typing import Any, Callable, Dict, Mapping, Optional, Tuple, TypeVar, Union

import jax
import numpy as np

from ..base import Module, Parameter
from ..config import default_summary_fmt

__all__ = [
    "deepcopy",
    "freeze",
    "leaf_components",
    "multiple_assign",
    "parameter_dict",
    "print_summary",
    "read_values",
    "reset_cache_bijectors",
    "select_dict_parameters_with_prior",
    "tabulate_module_summary",
    "traverse_module",
]

LeafComponent = Union[Parameter, jax.Array]
Path = str
M = TypeVar("M", bound=Module)

# import-level parity with reference ``traversal.py:43-49`` (the TF-variable
# legs of the unions collapse onto Parameter/arrays in the pytree system)
LeafVariable = Union[Parameter, jax.Array]
HashableTensor = Parameter
TraverseInput = TypeVar("TraverseInput", Parameter, Module)
State = TypeVar("State")
Accumulator = Tuple[Path, Any]
TraverseUpdateCallable = Callable[[Any, Path, Any], Any]


def traverse_module(
    m: Any,
    acc: Tuple[Path, Any],
    update_cb: Callable[[Any, Path, Any], Any],
    target_types: Tuple[type, ...],
) -> Any:
    """Recursively walks ``m``, calling ``update_cb(leaf, path, state)`` on
    every instance of ``target_types`` (reference ``traversal.py:280-323``)."""
    path, state = acc
    if isinstance(m, target_types):
        state = update_cb(m, path, state)
        if not isinstance(m, Module):
            return state
    if isinstance(m, Module):
        for key in sorted(vars(m)):
            if key.startswith("__"):
                continue
            val = vars(m)[key]
            state = traverse_module(val, (f"{path}.{key}", state), update_cb, target_types)
    elif isinstance(m, (list, tuple)):
        for i, item in enumerate(m):
            state = traverse_module(item, (f"{path}[{i}]", state), update_cb, target_types)
    elif isinstance(m, dict):
        for k in sorted(m):
            state = traverse_module(m[k], (f"{path}['{k}']", state), update_cb, target_types)
    return state


def leaf_components(m: Module) -> Dict[Path, LeafComponent]:
    """Maps dotted paths -> Parameter leaves (reference ``traversal.py:70-92``)."""
    root = type(m).__name__

    def _collect(leaf: Any, path: Path, state: Dict[Path, LeafComponent]) -> Dict[Path, LeafComponent]:
        if isinstance(leaf, Parameter):
            state[path] = leaf
        return state

    return traverse_module(m, (root, {}), _collect, (Parameter, Module))


def parameter_dict(m: Module) -> Dict[Path, Parameter]:
    """Returns {".kernel.variance": Parameter, ...} keyed relative to the module
    (reference ``traversal.py:145-160``: keys have the root name stripped)."""
    root = type(m).__name__
    return {k[len(root):]: v for k, v in leaf_components(m).items()}


def read_values(m: Module) -> Dict[Path, np.ndarray]:
    """Returns constrained parameter values (reference ``traversal.py:65-67``)."""
    return {k: v.numpy() for k, v in parameter_dict(m).items()}


def multiple_assign(m: Module, vars_dict: Mapping[Path, Any]) -> None:
    """Assigns many parameters by path (reference ``traversal.py:52-62``).

    Atomic: every path and value is validated BEFORE the first parameter is
    mutated, so a bad entry (unknown path, shape mismatch, NaN) leaves the
    model fully unchanged instead of half-updated."""
    params = parameter_dict(m)
    prepared = []
    for path, value in vars_dict.items():
        if path not in params:
            raise KeyError(f"No parameter at path {path!r}; available: {sorted(params)}")
        prepared.append((params[path], params[path]._prepare_assign(value)))
    for p, unconstrained in prepared:
        p._unconstrained = unconstrained


def select_dict_parameters_with_prior(m: Module) -> Dict[Path, Parameter]:
    """Parameters that have a prior attached (reference ``traversal.py:356-362``)."""
    return {k: p for k, p in parameter_dict(m).items() if p.prior is not None}


def reset_cache_bijectors(input_module: M) -> M:
    """Drop-in for reference ``traversal.py:197-248``: there the TFP
    bijectors cache forward/inverse tensors and must be cleared before a
    deepcopy. Our bijectors are stateless frozen dataclasses — there is no
    cache — so this returns the module unchanged."""
    return input_module


def deepcopy(m: M, memo: Optional[Dict[int, Any]] = None) -> M:
    """Deep copy of a module tree (reference ``traversal.py:254-264``; the
    bijector-cache workaround is unnecessary here — our bijectors are
    stateless frozen dataclasses, see ``reset_cache_bijectors``)."""
    return _copy.deepcopy(reset_cache_bijectors(m), memo)


def freeze(m: M) -> M:
    """Returns a copy with every Parameter replaced by a constant (stop_gradient
    semantics; reference ``traversal.py:267-277`` converts to tf constants).

    Implemented by marking all parameters non-trainable in a deep copy; jit'd
    losses then exclude them from gradients, matching reference behavior.
    """
    frozen = deepcopy(m)
    for p in frozen.parameters:
        p.trainable = False
    return frozen


def _format_value(p: Any) -> str:
    arr = np.asarray(p.value if isinstance(p, Parameter) else p)
    if arr.size == 1:
        return f"{arr.reshape(())}"
    return np.array2string(arr, precision=5, threshold=8)


def tabulate_module_summary(m: Module, tablefmt: Optional[str] = None) -> str:
    """Parameter summary table (reference ``traversal.py:95-142``)."""
    components = leaf_components(m)
    headers = ["name", "class", "transform", "prior", "trainable", "shape", "dtype", "value"]
    rows = []
    for path, p in components.items():
        rows.append(
            [
                path,
                "Parameter",
                p.transform.name,
                p.prior.name if p.prior is not None else "",
                str(p.trainable),
                str(p.shape),
                np.dtype(p.dtype).name,
                _format_value(p),
            ]
        )
    try:
        from tabulate import tabulate

        fmt = tablefmt if tablefmt is not None else (default_summary_fmt() or "simple")
        return tabulate(rows, headers=headers, tablefmt=fmt)
    except ImportError:  # pragma: no cover - tabulate is usually available
        lines = ["\t".join(headers)]
        lines += ["\t".join(r) for r in rows]
        return "\n".join(lines)


def print_summary(m: Module, fmt: Optional[str] = None) -> None:
    """Prints the parameter table (reference ``traversal.py:95-110``)."""
    if fmt is None:
        fmt = default_summary_fmt()  # honor set_default_summary_fmt
    if fmt == "notebook":  # pragma: no cover
        from IPython.display import HTML, display

        display(HTML("<pre>" + tabulate_module_summary(m, "html") + "</pre>"))
    else:
        print(tabulate_module_summary(m, fmt))
