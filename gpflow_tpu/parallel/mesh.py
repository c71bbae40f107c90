"""Mesh construction and sharding helpers."""
from __future__ import annotations

from typing import Any, Mapping, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = ["make_mesh", "replicated", "shard_batch"]

DEFAULT_AXIS = "data"
LATENT_AXIS = "latent"


def make_mesh(
    num_devices: Optional[int] = None,
    axis_name: str = DEFAULT_AXIS,
    devices: Optional[Sequence[jax.Device]] = None,
    shape: Optional[Mapping[str, int]] = None,
) -> Mesh:
    """Device mesh for scale-out.

    Default: a 1-D mesh over the batch/data axis. For SVGP-style
    single-output models this is the only dimension worth sharding: M ~ 2048
    inducing state fits comfortably replicated per chip, and the [M, M]
    Cholesky is cheaper to replicate than to distribute.

    ``shape`` builds an N-D mesh instead, e.g. ``{"data": 4, "latent": 2}``
    for multioutput models where the L independent latent GPs are the second
    shardable dimension (each device then holds L/2 of the [L, M, M]
    Choleskys and variational state - see ``DataParallelTrainer``'s
    ``latent_axis``). Axis order follows the mapping's order; the data axis
    should come first so batch shards ride neighbouring ICI links.
    """
    devices = list(devices) if devices is not None else jax.devices()
    if shape is not None:
        if num_devices is not None:
            raise ValueError(
                "Pass either `shape` or `num_devices`, not both (the mesh "
                "size is the product of the `shape` sizes)."
            )
        names = tuple(shape)
        sizes = tuple(int(shape[n]) for n in names)
        total = int(np.prod(sizes))
        if total > len(devices):
            raise ValueError(
                f"mesh shape {dict(shape)} needs {total} devices, "
                f"have {len(devices)}"
            )
        return Mesh(np.array(devices[:total]).reshape(sizes), names)
    n = num_devices if num_devices is not None else len(devices)
    if n > len(devices):
        # raising (like the shape= path) instead of silently truncating: a
        # smaller mesh than requested doubles the per-device batch and
        # breaks the caller's divisibility assumptions without any signal
        raise ValueError(f"num_devices={n} requested but only {len(devices)} available")
    return Mesh(np.array(devices[:n]), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def shard_batch(mesh: Mesh, axis_name: str = DEFAULT_AXIS) -> NamedSharding:
    """Shards the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, PartitionSpec(axis_name))
