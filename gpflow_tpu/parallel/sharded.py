"""N-dimension sharding for internal-data models and batch prediction
(SURVEY.md §2.14/§7.1: "batch/data sharding of N over TPU devices for
SVGP/SGPR reductions (psum over ICI), replicated M×M solves, and optional
sharded N×N exact-GP path").

No model code changes are needed: placing the training-data arrays with a
row sharding is enough — XLA's sharding propagation keeps every O(N·...)
intermediate distributed and inserts the ICI collectives at the reductions:

* SGPR / CGLB / BayesianGPLVM: ``Kuf`` [M, N] is built column-sharded and the
  dominant ``A A^T`` ([M, M] from [M, N]) reduction becomes per-device
  partial sums + one ``psum``; the [M, M] Cholesky stays replicated.
* GPR / VGP (exact path): K(X, X) rows are built sharded; the [N, N]
  Cholesky itself is gathered and replicated (XLA has no distributed
  Cholesky — and at GP scales the O(N^2 D) build is the shardable part).
* Prediction: test points are embarrassingly row-parallel at any scale.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from jax.sharding import Mesh

from ..base import Module
from .mesh import DEFAULT_AXIS, make_mesh, shard_batch

__all__ = ["shard_internal_data", "sharded_predict_f"]


def shard_internal_data(
    model: Module, mesh: Optional[Mesh] = None, axis_name: str = DEFAULT_AXIS
) -> Module:
    """Row-shards an internal-data model's training set over the mesh,
    in place; returns the model.

    After this, a jitted objective that takes the MODEL as a jit argument —
    which is exactly what ``model.training_loss_closure(compile=True)``
    does — computes the data-dimension work distributed across the mesh.
    (Objectives that close over the model instead, like a hand-written
    ``jax.jit(lambda: model.training_loss())``, bake the data in as
    compile-time constants: still numerically correct, but replicated.)
    """
    data = getattr(model, "data", None)
    if data is None:
        raise ValueError(
            "shard_internal_data expects an internal-data model with a "
            "`.data` attribute (GPR/SGPR/VGP/CGLB/GPLVM...); for external-"
            "data (minibatch) models use DataParallelTrainer instead."
        )
    mesh = mesh if mesh is not None else make_mesh(axis_name=axis_name)
    sharding = shard_batch(mesh, axis_name)
    from ..base import Parameter

    def place(a: Any) -> Any:
        if isinstance(a, Parameter):
            # trainable data (GPLVM's latent X): leave the Parameter intact —
            # sharding a trainable leaf would detach it from the optimizer
            return a
        return jax.device_put(jnp.asarray(a), sharding)

    model.data = tuple(place(a) for a in data)
    return model


_PREDICT_JITS: dict = {}


def sharded_predict_f(
    model: Any,
    Xnew: Any,
    mesh: Optional[Mesh] = None,
    axis_name: str = DEFAULT_AXIS,
    **predict_kwargs: Any,
) -> Tuple[jax.Array, jax.Array]:
    """``model.predict_f`` with the test points row-sharded over the mesh —
    embarrassingly parallel over devices; parameters/caches replicate.

    Accepts a model or a precomputed posterior (anything with
    ``predict_f(Xnew, **kwargs)``). Returns device-sharded (mean, var).

    The jitted wrapper is cached per kwargs and takes the MODEL as a jit
    argument, so repeated calls (a serving loop) reuse one compiled
    executable — for any model of the same pytree structure, at the
    CURRENT parameter values — instead of retracing every call.
    """
    mesh = mesh if mesh is not None else make_mesh(axis_name=axis_name)
    sharding = shard_batch(mesh, axis_name)
    Xd = jax.device_put(jnp.asarray(Xnew), sharding)

    key = tuple(sorted(predict_kwargs.items()))
    fn = _PREDICT_JITS.get(key)
    if fn is None:
        kwargs = dict(predict_kwargs)

        def _predict(m: Any, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
            return m.predict_f(x, **kwargs)

        fn = jax.jit(_predict)
        _PREDICT_JITS[key] = fn
    return fn(model, Xd)
