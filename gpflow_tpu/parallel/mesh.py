"""Mesh construction and sharding helpers."""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = ["make_mesh", "replicated", "shard_batch"]

DEFAULT_AXIS = "data"


def make_mesh(
    num_devices: Optional[int] = None,
    axis_name: str = DEFAULT_AXIS,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """1-D mesh over the available devices (batch/data axis).

    For SVGP-style models the only dimension worth sharding is N (data):
    M ~ 2048 inducing state fits comfortably replicated per chip, and the
    [M, M] Cholesky is cheaper to replicate than to distribute.
    """
    devices = list(devices) if devices is not None else jax.devices()
    n = num_devices if num_devices is not None else len(devices)
    return Mesh(np.array(devices[:n]), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def shard_batch(mesh: Mesh, axis_name: str = DEFAULT_AXIS) -> NamedSharding:
    """Shards the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, PartitionSpec(axis_name))
