"""Checkpoint save/restore for Module trees.

The reference delegates checkpointing to TF (``tf.train.Checkpoint`` /
``saved_model``; SURVEY.md §5). Here the equivalent is an orbax checkpoint of
the ``parameter_dict`` pytree, with an npz fallback — composed with
``read_values``/``multiple_assign`` so the same dict API round-trips.
"""
from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np

from ..base import Module
from .traversal import multiple_assign, parameter_dict, read_values

__all__ = ["load_checkpoint", "save_checkpoint"]


def save_checkpoint(path: str, module: Module) -> None:
    """Saves all parameter values of ``module`` under ``path``.

    Uses orbax (directory checkpoint) when available, else a .npz file.
    """
    values = read_values(module)
    try:
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        checkpointer = ocp.PyTreeCheckpointer()
        checkpointer.save(path, {k.replace(".", "|"): np.asarray(v) for k, v in values.items()},
                          force=True)
    except ImportError:  # pragma: no cover - orbax is baked into the image
        np.savez(path if path.endswith(".npz") else path + ".npz", **values)


def load_checkpoint(path: str, module: Module) -> Dict[str, Any]:
    """Restores parameter values saved by ``save_checkpoint`` into ``module``;
    returns the loaded dict."""
    try:
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        checkpointer = ocp.PyTreeCheckpointer()
        restored = checkpointer.restore(path)
        values = {k.replace("|", "."): v for k, v in restored.items()}
    except ImportError:  # pragma: no cover
        npz = np.load(path if path.endswith(".npz") else path + ".npz")
        values = {k: npz[k] for k in npz.files}
    # restore only matching parameters (allows partial/forward-compatible loads)
    params = parameter_dict(module)
    matching = {k: v for k, v in values.items() if k in params}
    multiple_assign(module, matching)
    return values
