"""Mesh construction and sharding helpers."""
from __future__ import annotations

from typing import Any, Mapping, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = ["make_hybrid_mesh", "make_mesh", "replicated", "shard_batch"]

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


def make_hybrid_mesh(
    ici: Mapping[str, int],
    dcn: Optional[Mapping[str, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """DCN-aware mesh for multi-slice TPU pods.

    Each named axis has total size ``ici[name] * dcn.get(name, 1)``: the
    ``ici`` factor lays out WITHIN a slice (fast chip-to-chip interconnect),
    the ``dcn`` factor ACROSS slices (slow data-center network). Shard so
    traffic matches the link:

    * the **data/batch axis** goes in ``dcn`` — its only collective is one
      gradient/ELBO psum per step, which amortizes the slow link;
    * **model axes** (``latent`` for multioutput state) stay ICI-only —
      their collectives sit inside the per-step math.

    On multi-slice hardware this delegates to
    ``jax.experimental.mesh_utils.create_hybrid_device_mesh`` so device
    coordinates actually map to the physical topology. On single-slice (or
    CPU-mesh test) environments the same logical mesh is built by an
    ordinary reshape, so code written against a hybrid mesh runs unchanged.

    Example — 2 slices of 4 chips, data-parallel across slices, latent
    model-parallel inside each::

        mesh = make_hybrid_mesh(ici={"data": 2, "latent": 2}, dcn={"data": 2})
        # axes: data=4 (2 per slice x 2 slices), latent=2 (ICI-only)
    """
    dcn = dict(dcn or {})
    unknown = set(dcn) - set(ici)
    if unknown:
        raise ValueError(
            f"dcn axes {sorted(unknown)} not in ici axes {sorted(ici)}; "
            "declare every axis in `ici` (use ici size 1 for pure-DCN axes)"
        )
    names = tuple(ici)
    ici_sizes = tuple(int(ici[n]) for n in names)
    dcn_sizes = tuple(int(dcn.get(n, 1)) for n in names)
    ici_total = int(np.prod(ici_sizes))
    dcn_total = int(np.prod(dcn_sizes))
    total = ici_total * dcn_total
    devices = list(devices) if devices is not None else jax.devices()
    if total > len(devices):
        raise ValueError(
            f"hybrid mesh ici={dict(ici)} x dcn={dcn} needs {total} devices, "
            f"have {len(devices)}"
        )
    def _reshape_mesh(devs: Sequence[jax.Device]) -> Mesh:
        # single granule: the hybrid layout degenerates to a reshape with
        # each axis's DCN factor outermost — (d0..dk, i0..ik) interleaved to
        # (d0, i0, d1, i1, ...) then merged per axis
        arr = np.array(devs).reshape(dcn_sizes + ici_sizes)
        k = len(names)
        arr = arr.transpose([x for i in range(k) for x in (i, k + i)])
        return Mesh(
            arr.reshape(tuple(d * i for d, i in zip(dcn_sizes, ici_sizes))), names
        )

    # Group by slice BEFORE selecting: a naive devices[:total] can swallow a
    # whole slice and silently collapse the requested cross-slice layout onto
    # one granule, or select an uneven cross-slice subset that
    # create_hybrid_device_mesh rejects with a cryptic granule-count error.
    by_slice: dict = {}
    for d in devices:
        by_slice.setdefault(getattr(d, "slice_index", None) or 0, []).append(d)
    slice_ids = sorted(by_slice)
    if len(slice_ids) == 1:
        return _reshape_mesh(devices[:total])
    if dcn_total > len(slice_ids):
        raise ValueError(
            f"hybrid mesh dcn={dcn} needs {dcn_total} slices, "
            f"have {len(slice_ids)}"
        )
    usable = [s for s in slice_ids if len(by_slice[s]) >= ici_total]
    if len(usable) < dcn_total:
        short = [s for s in slice_ids if len(by_slice[s]) < ici_total]
        raise ValueError(
            f"hybrid mesh ici={dict(ici)} needs {ici_total} devices per "
            f"slice on {dcn_total} slices; slices {short} have fewer"
        )
    if dcn_total == 1:
        # keep the mesh inside ONE slice (spanning slices without declaring
        # a dcn axis would put per-step collectives on the slow link)
        return _reshape_mesh(by_slice[usable[0]][:total])
    from jax.experimental import mesh_utils

    selected = [d for s in usable[:dcn_total] for d in by_slice[s][:ici_total]]
    arr = mesh_utils.create_hybrid_device_mesh(
        ici_sizes, dcn_sizes, devices=selected
    )
    return Mesh(arr, names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def shard_batch(mesh: Mesh, axis_name: str = DEFAULT_AXIS) -> NamedSharding:
    """Shards the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, PartitionSpec(axis_name))
