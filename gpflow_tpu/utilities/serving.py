"""Deployable serving exports via StableHLO (``jax.export``).

The reference's deployment story is ``tf.saved_model``: attach
``tf.function``-compiled predict methods to the module, freeze parameters
to constants, and save a self-contained artifact that serves without the
model-building Python code (reference
``doc/sphinx/notebooks/getting_started/saving_and_loading.pct.py:193-212``).

The TPU-native equivalent serializes the jitted predict functions to
StableHLO: parameters are baked in as constants, the batch dimension is
symbolic (any N at call time), and the artifact is lowered for both CPU
and TPU so one export serves everywhere. Loading needs only jax — no
gpflow_tpu model code.

    export_serving(model, "/path/artifact", input_dim=8)
    served = load_serving("/path/artifact")
    mean, var = served.predict_f(Xnew)

For parameter-preserving (re-trainable) persistence use
``save_checkpoint``/``load_checkpoint`` (orbax) or ``parameter_dict`` +
``multiple_assign`` instead.
"""
from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

__all__ = ["ServedModel", "export_serving", "load_serving"]

_METADATA_FILE = "serving.json"


def _build_method(
    model: Any, name: str, posterior: Optional[Any]
) -> Callable[[Any], Tuple[jax.Array, jax.Array]]:
    """``posterior`` is the model's precomputed cache, built ONCE by
    ``export_serving`` and shared across all exported methods."""
    if name in ("predict_f", "predict_y"):
        # serve through the cached posterior where the model offers one:
        # (alpha, Qinv) are precomputed so the call is matmul-only
        if posterior is not None:
            if name == "predict_f":
                return lambda X: posterior.predict_f(X)
            likelihood = getattr(model, "likelihood", None)
            if likelihood is not None and hasattr(likelihood, "predict_mean_and_var"):
                # predict_y from the same cache: cached predict_f pushed
                # through the likelihood — no per-call Kuu Cholesky
                def predict_y(X: Any) -> Tuple[jax.Array, jax.Array]:
                    fmean, fvar = posterior.predict_f(X)
                    return likelihood.predict_mean_and_var(X, fmean, fvar)

                return predict_y
        fn = getattr(model, name)
        return lambda X: fn(X)
    if name == "predict_mean":
        if posterior is not None and hasattr(posterior, "predict_mean"):
            return lambda X: posterior.predict_mean(X)
        if posterior is not None:
            # still serve from the precomputed cache (matmul-only) rather
            # than dropping to the fused path's per-call Kuu Cholesky
            return lambda X: posterior.predict_f(X)[0]
        return lambda X: model.predict_f(X)[0]
    raise ValueError(f"Unknown serving method {name!r}")


def export_serving(
    model: Any,
    path: str,
    input_dim: int,
    dtype: Optional[Any] = None,
    methods: Sequence[str] = ("predict_f", "predict_y"),
    platforms: Sequence[str] = ("cpu", "tpu"),
    batch_symbol: str = "batch",
    batch_size: Optional[int] = None,
    bucket_sizes: Optional[Sequence[int]] = None,
) -> Dict[str, str]:
    """Exports jitted predict methods to a self-contained StableHLO artifact.

    :param model: a trained model (GPR/SGPR/SVGP/VGP/... — anything with the
        requested predict methods). Parameters are baked in as constants.
    :param input_dim: D of the [N, D] prediction inputs; N stays symbolic.
    :param dtype: input dtype (defaults to ``default_float()``).
    :param methods: which endpoints to export; ``predict_f`` routes through
        the cached posterior when the model has one (matmul-only serving).
    :param platforms: lowering targets embedded in the artifact.
    :param batch_size: export with a FIXED batch size instead of a symbolic
        one. Use when a compute path cannot trace shape-polymorphically;
        pair the loaded artifact with ``bucketize`` to serve arbitrary N.
    :param bucket_sizes: BUCKETED export: one fixed-shape lowering per
        bucket size. Fixed shapes trace the fused Pallas covariance kernel
        fine, so (TPU-only exports) the artifact keeps the fast compute path
        the symbolic-batch export must forgo — ~3x throughput at serving
        scale (PERFORMANCE.md "Serving artifacts"). The loader picks the
        smallest bucket >= N, zero-pads, and slices the outputs back;
        requests beyond the largest bucket are served in max-bucket chunks.
    :returns: mapping method name (``name@bucket`` for bucketed exports) ->
        written file path.
    """
    from ..config import default_float
    from ..ops import get_pallas_enabled, set_pallas_enabled

    dtype = jnp.dtype(dtype if dtype is not None else default_float())
    os.makedirs(path, exist_ok=True)
    if bucket_sizes is not None:
        if batch_size is not None:
            raise ValueError("pass either batch_size or bucket_sizes, not both")
        buckets = sorted(int(b) for b in bucket_sizes)
        if not buckets or any(b <= 0 for b in buckets):
            raise ValueError(f"bucket_sizes must be positive, got {bucket_sizes}")
        shapes = [(b, input_dim) for b in buckets]
    elif batch_size is None:
        shapes = [jax_export.symbolic_shape(f"{batch_symbol}, {input_dim}")]
        buckets = None
    else:
        shapes = [(int(batch_size), input_dim)]
        buckets = None

    # A symbolic-batch export must be portable and shape-polymorphic, so it
    # forces the plain XLA compute path (the Pallas covariance kernel lowers
    # only for TPU and its MXU tile padding cannot trace with a symbolic
    # batch). FIXED-shape exports targeting only TPU keep Pallas on — that
    # is the point of bucketed exports.
    fixed_shapes = bucket_sizes is not None or batch_size is not None
    keep_pallas = fixed_shapes and set(platforms) == {"tpu"}
    prev_pallas = get_pallas_enabled()
    if not keep_pallas:
        set_pallas_enabled(False)
    posterior = model.posterior() if hasattr(model, "posterior") else None
    written: Dict[str, str] = {}
    try:
        for name in methods:
            fn = _build_method(model, name, posterior)
            jitted = jax.jit(fn)
            for shape in shapes:
                arg = jax.ShapeDtypeStruct(shape, dtype)
                exp = jax_export.export(jitted, platforms=tuple(platforms))(arg)
                key = f"{name}@{shape[0]}" if buckets is not None else name
                fname = os.path.join(path, f"{key}.stablehlo")
                with open(fname, "wb") as f:
                    f.write(exp.serialize())
                written[key] = fname
    finally:
        set_pallas_enabled(prev_pallas)

    with open(os.path.join(path, _METADATA_FILE), "w") as f:
        json.dump(
            {
                "methods": list(methods),
                "input_dim": int(input_dim),
                "dtype": str(dtype),
                "platforms": list(platforms),
                "batch_size": batch_size,
                "bucket_sizes": buckets,
                "model_class": type(model).__name__,
            },
            f,
            indent=2,
        )
    return written


class ServedModel:
    """Deserialized serving artifact: one callable per exported method.
    Self-contained — parameters live inside the StableHLO as constants.

    For bucketed artifacts (``export_serving(..., bucket_sizes=...)``) each
    method call picks the smallest bucket >= N, zero-pads the inputs,
    dispatches the fixed-shape program, and slices the outputs back to N;
    N beyond the largest bucket is served in max-bucket chunks."""

    def __init__(self, path: str) -> None:
        with open(os.path.join(path, _METADATA_FILE)) as f:
            self.metadata = json.load(f)
        self._methods: Dict[str, Any] = {}
        buckets = self.metadata.get("bucket_sizes")
        for name in self.metadata["methods"]:
            if buckets is not None:
                table = {}
                for b in buckets:
                    with open(os.path.join(path, f"{name}@{b}.stablehlo"), "rb") as f:
                        table[int(b)] = jax_export.deserialize(f.read())
                self._methods[name] = table
                setattr(self, name, self._make_bucketed_caller(table))
            else:
                with open(os.path.join(path, f"{name}.stablehlo"), "rb") as f:
                    exported = jax_export.deserialize(f.read())
                self._methods[name] = exported
                setattr(self, name, self._make_caller(exported))

    def _make_caller(self, exported: Any) -> Callable[[Any], Any]:
        dtype = jnp.dtype(self.metadata["dtype"])
        # jit the deserialized program once: Exported.call alone re-enters
        # the export calling convention on every invocation (~1.5 ms/call of
        # pure dispatch overhead at serving batch sizes)
        jitted = jax.jit(exported.call)

        def call(X: Any) -> Any:
            return jitted(jnp.asarray(X, dtype=dtype))

        return call

    def _make_bucketed_caller(self, table: Dict[int, Any]) -> Callable[[Any], Any]:
        dtype = jnp.dtype(self.metadata["dtype"])
        buckets = sorted(table)
        max_bucket = buckets[-1]
        jitted = {b: jax.jit(table[b].call) for b in buckets}

        def call_padded(X: jax.Array) -> Any:
            n = X.shape[0]
            bucket = next(b for b in buckets if b >= n)
            pad = bucket - n
            Xp = jnp.pad(X, ((0, pad), (0, 0))) if pad else X
            out = jitted[bucket](Xp)
            if not pad:
                return out
            if isinstance(out, (tuple, list)):
                return type(out)(o[:n] for o in out)
            return out[:n]

        def call(X: Any) -> Any:
            X = jnp.asarray(X, dtype=dtype)
            n = X.shape[0]
            if n <= max_bucket:
                return call_padded(X)
            parts = [
                call_padded(X[i : i + max_bucket]) for i in range(0, n, max_bucket)
            ]
            first = parts[0]
            if isinstance(first, (tuple, list)):
                return type(first)(
                    jnp.concatenate([p[i] for p in parts], axis=0)
                    for i in range(len(first))
                )
            return jnp.concatenate(parts, axis=0)

        return call

    @property
    def methods(self) -> Sequence[str]:
        return list(self._methods)


def load_serving(path: str) -> ServedModel:
    """Loads an ``export_serving`` artifact; needs only jax, not the model
    code that produced it."""
    return ServedModel(path)
