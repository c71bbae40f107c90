"""Core parameter/state system: pytree-native ``Module`` and ``Parameter``.

TPU-native re-design of the reference's ``tf.Module`` + ``Parameter
(tfp.util.TransformedVariable)`` tree (``/root/reference/gpflow/base.py:73-338``).

Design (see SURVEY.md §7.1):
  * A ``Parameter`` stores the *unconstrained* value as a jax array plus static
    metadata (bijector transform, prior, prior_on, trainable, name). It is a
    pytree with one child (the unconstrained array) so that whole models jit,
    grad, and vmap as ordinary pytrees.
  * A ``Module`` is a mutable Python object whose subclasses are automatically
    registered as pytrees: attributes holding Parameters/Modules/arrays (or
    containers thereof) are dynamic children; everything else is static aux
    data. The same model object works imperatively outside jit (``param.assign``)
    and functionally inside jit (tree_unflatten of traced leaves).
  * Static aux data is made hashable so jit caches on treedef equality and a
    model never retraces unless its structure/static config actually changed.
"""
from __future__ import annotations

import enum
from typing import Any, Callable, Dict, Iterable, List, Mapping, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .bijectors import Bijector, Identity
from .config import default_float
from .priors import Prior

__all__ = [
    "AnyNDArray",
    "InputData",
    "MeanAndVariance",
    "Module",
    "OutputData",
    "Parameter",
    "PriorOn",
    "RegressionData",
    "TensorData",
    "TensorLike",
    "TensorType",
    "Transform",
]

# ---------------------------------------------------------------------------
# Type aliases (reference base.py:285-296)
# ---------------------------------------------------------------------------
TensorType = Union[np.ndarray, jax.Array, "Parameter"]
# For REGISTERING tensor arguments with a Dispatcher (reference base.py:51-58):
# a tuple of types is a union signature; plain arrays/tracers match `object`.
TensorLike: Tuple[type, ...] = (object,)
AnyNDArray = np.ndarray
TensorData = Union[np.ndarray, jax.Array, "Parameter"]
Transform = Union[Bijector]  # import-level parity with reference ``base.py:45``
InputData = TensorType
OutputData = TensorType
RegressionData = Tuple[InputData, OutputData]
MeanAndVariance = Tuple[jax.Array, jax.Array]


class PriorOn(enum.Enum):
    """Where a parameter's prior density is evaluated (reference base.py:66-70)."""

    CONSTRAINED = "constrained"
    UNCONSTRAINED = "unconstrained"


# ---------------------------------------------------------------------------
# Parameter
# ---------------------------------------------------------------------------

# Read-capture hooks: optimizers that jit user closures (NaturalGradient)
# discover which Parameters a closure reads so they can pass their CURRENT
# values as traced arguments instead of baking them in as compile-time
# constants. Near-zero overhead when no capture is active (one truthiness
# check per read).
_PARAM_READ_CAPTURE: List[List["Parameter"]] = []


def _record_parameter_read(p: "Parameter") -> None:
    if _PARAM_READ_CAPTURE:
        _PARAM_READ_CAPTURE[-1].append(p)


class capture_parameter_reads:
    """Context manager collecting every Parameter whose value is read inside
    the block; ``.parameters`` holds them afterward in first-read order,
    deduplicated by identity."""

    def __enter__(self) -> "capture_parameter_reads":
        self._raw: List["Parameter"] = []
        _PARAM_READ_CAPTURE.append(self._raw)
        self.parameters: List["Parameter"] = []
        return self

    def __exit__(self, *exc: Any) -> None:
        _PARAM_READ_CAPTURE.pop()
        seen: set = set()
        for p in self._raw:
            if id(p) not in seen:
                seen.add(id(p))
                self.parameters.append(p)


def functionalize(
    closure: Callable[[], Any], parameters: Sequence["Parameter"]
) -> Callable[[Sequence[Any]], Any]:
    """Turns a zero-argument loss closure reading ``parameters`` into a pure
    function of their unconstrained values, by temporarily swapping each
    parameter's storage and restoring it afterwards (exception-safe).

    The single shared implementation of the pattern used by every optimizer
    (Scipy, NaturalGradient, SamplingHelper, training_loop): under jit the
    swapped-in values are tracers, so the closure's reads become traced
    inputs instead of baked-in constants.
    """

    def fn(unconstrained: Sequence[Any]) -> Any:
        originals = [p._unconstrained for p in parameters]
        try:
            for p, u in zip(parameters, unconstrained):
                p._unconstrained = u
            return closure()
        finally:
            for p, o in zip(parameters, originals):
                p._unconstrained = o

    return fn


def _to_array(value: Any, dtype: Any) -> np.ndarray:
    """Host-side array conversion. Parameter construction/assignment stays
    in NumPy: on remote-attached chips each eager device op costs an RPC
    (and possibly a remote compile), so building a model must not touch the
    device — leaves transfer batched at the first jit dispatch instead.
    Tracers pass through untouched (assign inside a trace)."""
    if isinstance(value, Parameter):
        value = value.value
    if isinstance(value, jax.core.Tracer):
        return value if dtype is None else jnp.asarray(value, dtype=dtype)
    # Python scalars/lists are weakly typed: np.asarray would promote them to
    # float64 regardless of the configured default_float (x64-off configs
    # included), so only arrays that already CARRY an explicit float dtype
    # keep it; everything else takes default_float().
    has_explicit_dtype = isinstance(value, (np.ndarray, np.generic, jax.Array))
    value = np.asarray(value)
    if dtype is None:
        # jnp.issubdtype also recognizes ml_dtypes floats (bfloat16, ...)
        if has_explicit_dtype and jnp.issubdtype(value.dtype, jnp.floating):
            dtype = value.dtype
        else:
            dtype = default_float()
    # explicit dtype => strongly-typed array; np.array COPIES, so the
    # Parameter never aliases caller-owned storage (external in-place
    # mutation must not bypass assign()'s validation)
    return np.array(value, dtype=dtype)


def _apply(transform: Any, value: Any, direction: str) -> Any:
    """Applies a bijector host-side (NumPy) for concrete host values, and
    via the traced jnp path for tracers/device arrays. The host result is
    never the input object itself (Identity would alias the Parameter's
    storage, letting callers mutate it in place)."""
    if isinstance(value, (np.ndarray, np.generic)):
        # np.asarray on both sides: bijectors may hand back 0-d np scalars
        # (np.generic), which would otherwise kick scalar parameters off the
        # host path and onto the per-op eager device path
        out = np.asarray(getattr(transform, direction + "_np")(np.asarray(value)))
        return out.copy() if out is value else out
    return getattr(transform, direction)(value)


class Parameter:
    """A constrained model parameter (reference ``base.py:118-338``).

    Holds an unconstrained array ``u``; the user-facing value is
    ``transform.forward(u)``. Supports priors for MAP/MCMC via
    ``log_prior_density`` (with change-of-variables Jacobian correction,
    reference ``base.py:200-223``) and NaN/Inf-validated ``assign``
    (reference ``base.py:250-280,314-326``).

    Behaves like an array in arithmetic: ``kernel.variance * x`` works.
    """

    __array_priority__ = 100  # numpy defers binary ops to us

    def __init__(
        self,
        value: TensorData,
        *,
        transform: Optional[Bijector] = None,
        prior: Optional[Prior] = None,
        prior_on: Optional[Union[str, PriorOn]] = None,
        trainable: Optional[bool] = None,
        dtype: Any = None,
        name: Optional[str] = None,
        unconstrained_value: Optional[TensorData] = None,
        unconstrained_shape: Optional[Sequence[Optional[int]]] = None,
        constrained_shape: Optional[Sequence[Optional[int]]] = None,
        shape: Optional[Sequence[Optional[int]]] = None,
    ) -> None:
        if isinstance(value, Parameter):
            # copy-construction inherits the source's metadata unless
            # overridden (reference ``base.py:155-166``)
            transform = transform if transform is not None else value.transform
            prior = prior if prior is not None else value.prior
            prior_on = prior_on if prior_on is not None else value.prior_on
            trainable = value.trainable if trainable is None else trainable
            name = name if name is not None else value.name
            value = value.value
        self._transform: Bijector = transform if transform is not None else Identity()
        self.prior: Optional[Prior] = prior
        self.prior_on = prior_on if prior_on is not None else PriorOn.CONSTRAINED
        self.trainable: bool = True if trainable is None else bool(trainable)
        self.name: str = name or "parameter"
        if unconstrained_value is not None:
            if value is not None:
                raise ValueError(
                    "Pass either `value` or `unconstrained_value` to Parameter, "
                    "not both (the `value` would be silently ignored)."
                )
            u = _to_array(unconstrained_value, dtype)
            _validate_finite(u, self.name)
            self._unconstrained = u
        else:
            constrained = _to_array(value, dtype)
            unconstrained = _apply(self._transform, constrained, "inverse")
            # validate the *unconstrained* value (reference base.py:314-326):
            # catches both NaN/Inf input and out-of-domain values (e.g. a
            # variance below the transform's lower bound)
            _validate_finite(unconstrained, self.name)
            self._unconstrained = unconstrained
        # Declarative shape contracts (reference ``base.py:129-148,177-193``).
        # JAX shapes are static, so the declarations validate rather than
        # defer: each non-None entry must match the actual dim.
        if shape is not None:
            assert unconstrained_shape is None, "Cannot set both `shape` and `unconstrained_shape`."
            assert constrained_shape is None, "Cannot set both `shape` and `constrained_shape`."
            unconstrained_shape = shape
            constrained_shape = shape
        _validate_declared_shape(
            tuple(np.shape(self._unconstrained)), unconstrained_shape, self.name, "unconstrained"
        )
        if constrained_shape is not None and constrained_shape is not unconstrained_shape:
            constrained_now = _apply(self._transform, self._unconstrained, "forward")
            _validate_declared_shape(
                tuple(np.shape(constrained_now)), constrained_shape, self.name, "constrained"
            )

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self) -> Tuple[Tuple[jax.Array], Tuple[Any, ...]]:
        aux = (self._transform, self.prior, self._prior_on, self.trainable, self.name)
        return (self._unconstrained,), aux

    @classmethod
    def tree_unflatten(cls, aux: Tuple[Any, ...], children: Tuple[jax.Array]) -> "Parameter":
        obj = object.__new__(cls)
        obj._transform, obj.prior, obj._prior_on, obj.trainable, obj.name = aux
        obj._unconstrained = children[0]
        return obj

    # -- core accessors -----------------------------------------------------
    @property
    def transform(self) -> Bijector:
        return self._transform

    @property
    def prior_on(self) -> PriorOn:
        return self._prior_on

    @prior_on.setter
    def prior_on(self, value: Union[str, PriorOn]) -> None:
        self._prior_on = PriorOn(value) if not isinstance(value, PriorOn) else value

    @property
    def unconstrained_variable(self) -> jax.Array:
        _record_parameter_read(self)
        return self._unconstrained

    @property
    def value(self) -> jax.Array:
        _record_parameter_read(self)
        return _apply(self._transform, self._unconstrained, "forward")

    def numpy(self) -> np.ndarray:
        return np.asarray(self.value)

    @property
    def shape(self) -> Tuple[int, ...]:
        """Constrained shape. Cached per unconstrained shape: shape
        inspection must not re-run the forward bijector (O(L*M^2) host work
        for triangular transforms) nor count as a parameter READ for
        ``capture_parameter_reads`` (round-2 review finding)."""
        ushape = tuple(np.shape(self._unconstrained))
        cache = getattr(self, "_shape_cache", None)
        if cache is not None and cache[0] == ushape:
            return cache[1]
        cshape = tuple(np.shape(_apply(self._transform, self._unconstrained, "forward")))
        object.__setattr__(self, "_shape_cache", (ushape, cshape))
        return cshape

    @property
    def dtype(self) -> Any:
        return self._unconstrained.dtype

    @property
    def ndim(self) -> int:
        return len(self.shape)

    def _prepare_assign(self, value: TensorData) -> Any:
        """Validates a constrained value and returns the unconstrained array
        WITHOUT mutating the parameter (used by atomic ``multiple_assign``)."""
        constrained = _to_array(value, self.dtype)
        # shapes are compared in unconstrained space (transforms like
        # FillTriangular change the shape)
        unconstrained = _apply(self._transform, constrained, "inverse")
        if unconstrained.shape != self._unconstrained.shape:
            raise ValueError(
                f"Parameter {self.name!r}: cannot assign value of shape "
                f"{constrained.shape} to parameter of shape {self.shape}"
            )
        _validate_finite(unconstrained, self.name)
        return unconstrained

    def assign(self, value: TensorData) -> None:
        """Assigns a new *constrained* value (reference ``base.py:250-280``).

        Validates shape compatibility and rejects NaN/Inf like the reference's
        ``validate_unconstrained_value`` (``base.py:314-326``).
        """
        self._unconstrained = self._prepare_assign(value)

    def assign_unconstrained(self, value: TensorData) -> None:
        self._unconstrained = _to_array(value, self.dtype)

    def log_prior_density(self) -> jax.Array:
        """Log prior density of the constrained variable, including the
        change-of-variables Jacobian when the prior is placed on the
        unconstrained value (reference ``base.py:201-223``)."""
        _record_parameter_read(self)
        if self.prior is None:
            return jnp.zeros((), dtype=self.dtype)
        if self._prior_on is PriorOn.CONSTRAINED:
            return jnp.sum(self.prior.log_prob(self.value))
        # prior on unconstrained, evaluated in constrained space:
        # inverse_log_det_jacobian(y) == -forward_log_det_jacobian(x)
        x = self._unconstrained
        log_p = jnp.sum(self.prior.log_prob(x))
        log_p = log_p - jnp.sum(self._transform.forward_log_det_jacobian(x))
        return log_p

    # -- array protocol -----------------------------------------------------
    def __jax_array__(self) -> jax.Array:
        return self.value

    def __array__(self, dtype: Any = None) -> np.ndarray:
        arr = np.asarray(self.value)
        return arr.astype(dtype) if dtype is not None else arr

    def __getitem__(self, item: Any) -> jax.Array:
        return self.value[item]

    def __len__(self) -> int:
        return len(self.value)

    def __repr__(self) -> str:
        return (
            f"Parameter(name={self.name!r}, transform={self._transform.name}, "
            f"trainable={self.trainable}, shape={self.shape}, dtype={np.dtype(self.dtype).name},"
            f" value={np.array2string(np.asarray(self.value), threshold=20)})"
        )

    # arithmetic — delegate to the constrained jax array
    def __neg__(self) -> jax.Array:
        return -self.value

    def __abs__(self) -> jax.Array:
        return jnp.abs(self.value)

    def __add__(self, o: Any) -> jax.Array:
        return self.value + o

    def __radd__(self, o: Any) -> jax.Array:
        return o + self.value

    def __sub__(self, o: Any) -> jax.Array:
        return self.value - o

    def __rsub__(self, o: Any) -> jax.Array:
        return o - self.value

    def __mul__(self, o: Any) -> jax.Array:
        return self.value * o

    def __rmul__(self, o: Any) -> jax.Array:
        return o * self.value

    def __truediv__(self, o: Any) -> jax.Array:
        return self.value / o

    def __rtruediv__(self, o: Any) -> jax.Array:
        return o / self.value

    def __pow__(self, o: Any) -> jax.Array:
        return self.value ** o

    def __rpow__(self, o: Any) -> jax.Array:
        return o ** self.value

    def __matmul__(self, o: Any) -> jax.Array:
        return self.value @ o

    def __rmatmul__(self, o: Any) -> jax.Array:
        return o @ self.value

    def __lt__(self, o: Any) -> jax.Array:
        return self.value < o

    def __le__(self, o: Any) -> jax.Array:
        return self.value <= o

    def __gt__(self, o: Any) -> jax.Array:
        return self.value > o

    def __ge__(self, o: Any) -> jax.Array:
        return self.value >= o

    def __eq__(self, o: Any) -> Any:
        # elementwise, consistent with the ordering operators and with
        # tf.Variable semantics (round-2 review: == used to silently fall
        # back to identity while < was elementwise). Parameter-to-Parameter
        # identity checks should use `is` / id().
        if o is self:
            return True
        return self.value == (o.value if isinstance(o, Parameter) else o)

    def __ne__(self, o: Any) -> Any:
        if o is self:
            return False
        return self.value != (o.value if isinstance(o, Parameter) else o)

    # identity hash kept despite elementwise __eq__: Parameters are used as
    # set/dict members by identity throughout (capture hooks, trainers)
    __hash__ = object.__hash__


def _validate_declared_shape(
    actual: Tuple[int, ...],
    declared: Optional[Sequence[Optional[int]]],
    name: str,
    kind: str,
) -> None:
    """Checks an actual shape against a declared one where ``None`` entries
    match any dim (reference ``base.py:129-148`` shape declarations; static
    JAX shapes make this a constructor-time validation)."""
    if declared is None:
        return
    declared = tuple(declared)
    ok = len(declared) == len(actual) and all(
        d is None or int(d) == a for d, a in zip(declared, actual)
    )
    if not ok:
        raise ValueError(
            f"Parameter {name!r}: declared {kind} shape {declared} does not "
            f"match actual shape {actual}."
        )


def _validate_finite(value: Any, name: str) -> None:
    """NaN/Inf guard on (non-traced) assignment (reference ``base.py:314-326``)."""
    if isinstance(value, jax.core.Tracer):
        return
    if not bool(np.all(np.isfinite(np.asarray(value)))):
        raise ValueError(f"Parameter {name!r}: assigned value contains NaN or Inf")


jax.tree_util.register_pytree_node(
    Parameter,
    lambda p: p.tree_flatten(),
    Parameter.tree_unflatten,
)


# ---------------------------------------------------------------------------
# Module
# ---------------------------------------------------------------------------


def _is_dynamic(value: Any) -> bool:
    """True if ``value`` must be a traced pytree child (arrays / Parameters /
    Modules, or containers holding any of them)."""
    if isinstance(value, (Parameter, Module, jax.Array, np.ndarray)):
        return True
    if isinstance(value, (list, tuple)):
        return any(_is_dynamic(v) for v in value)
    if isinstance(value, dict):
        return any(_is_dynamic(v) for v in value.values())
    return False


def _hashable(value: Any) -> Any:
    """Best-effort conversion of static aux values to hashable form."""
    if isinstance(value, list):
        return tuple(_hashable(v) for v in value)
    if isinstance(value, dict):
        return tuple(sorted((k, _hashable(v)) for k, v in value.items()))
    if isinstance(value, set):
        return frozenset(_hashable(v) for v in value)
    return value


class _StaticValue:
    """Hashable aux wrapper that PRESERVES the original static object.

    jit caches on treedef equality, which needs hashable aux data — but the
    converted hashable form must not leak back into the reconstructed module
    (round-2 review: a static ``dict`` attribute used to come back from
    ``tree_unflatten`` as a tuple of pairs, breaking any jitted method that
    indexed it)."""

    __slots__ = ("value", "_key")

    def __init__(self, value: Any, key: Any) -> None:
        self.value = value
        self._key = key

    def __hash__(self) -> int:
        return hash(self._key)

    def __eq__(self, other: Any) -> bool:
        return isinstance(other, _StaticValue) and self._key == other._key

    def __repr__(self) -> str:
        return f"_StaticValue({self.value!r})"


def _static_entry(value: Any) -> Any:
    """`value` if hashable as-is, else a `_StaticValue` whose hash/eq use the
    converted form while the original object round-trips unchanged."""
    try:
        hash(value)
        return value
    except TypeError:
        return _StaticValue(value, _hashable(value))


def _unwrap_static(value: Any) -> Any:
    return value.value if isinstance(value, _StaticValue) else value


class _StaticSlot:
    """Marks a static element inside an otherwise-dynamic container."""

    __slots__ = ("entry",)

    def __init__(self, entry: Any) -> None:
        self.entry = entry

    def __hash__(self) -> int:
        return hash(("static-slot", self.entry))

    def __eq__(self, other: Any) -> bool:
        return isinstance(other, _StaticSlot) and self.entry == other.entry


def _dict_spec_items(v: Mapping) -> Any:
    """Items of ``v`` in JAX's canonical flatten order for its type: plain
    dict / defaultdict are flattened by SORTED key, OrderedDict by insertion
    order. The spec order must match, or flatten(unflatten(m)) would yield a
    different treedef than flatten(m) (round-2 review: tree_map over
    (model, grads) raised 'Mismatch custom node data' and every
    reconstructed module retraced)."""
    import collections

    if isinstance(v, collections.OrderedDict):
        return list(v.items())
    return sorted(v.items())


def _split_dynamic(v: Any) -> Tuple[Any, Any]:
    """Splits a dynamic value into (traced part, static-element spec).

    A mixed container (e.g. ``[Parameter(...), "label"]``) keeps its dynamic
    elements as pytree children while static elements move to the treedef as
    a spec (round-2 review: strings used to become pytree LEAVES, and any
    jit over the module failed with an abstract-array TypeError). Returns
    spec None when the container is purely dynamic — in that case ``v`` is
    returned UNTOUCHED so JAX's own handling of container types
    (OrderedDict order/type, defaultdict factory, ...) applies unchanged."""
    if isinstance(v, (list, tuple)):
        dyns, specs, has_static = [], [], False
        for e in v:
            if _is_dynamic(e):
                de, se = _split_dynamic(e)
                dyns.append(de)
                specs.append(se)
                has_static = has_static or se is not None
            else:
                dyns.append(None)
                specs.append(_StaticSlot(_static_entry(e)))
                has_static = True
        if not has_static:
            return v, None
        if isinstance(v, tuple):
            dyn = type(v)(*dyns) if hasattr(v, "_fields") else tuple(dyns)
        else:
            dyn = list(dyns)
        return dyn, ("seq", tuple(specs))
    if isinstance(v, dict):
        specs, has_static = [], False
        dyns = v.copy()  # preserves dict subclass type (defaultdict factory,
        # OrderedDict order) through the JAX round trip
        for k, e in _dict_spec_items(v):
            if _is_dynamic(e):
                de, se = _split_dynamic(e)
                dyns[k] = de
                specs.append((k, se))
                has_static = has_static or se is not None
            else:
                dyns[k] = None
                specs.append((k, _StaticSlot(_static_entry(e))))
                has_static = True
        if not has_static:
            return v, None
        return dyns, ("dict", tuple(specs))
    return v, None


def _merge_elem(dyn: Any, spec: Any) -> Any:
    if spec is None:
        return dyn
    if isinstance(spec, _StaticSlot):
        return _unwrap_static(spec.entry)
    return _merge_dynamic(dyn, spec)


def _merge_dynamic(dyn: Any, spec: Any) -> Any:
    if spec is None:
        return dyn
    tag, parts = spec
    if tag == "seq":
        merged = [_merge_elem(d, s) for d, s in zip(dyn, parts)]
        if isinstance(dyn, tuple):
            return type(dyn)(*merged) if hasattr(dyn, "_fields") else tuple(merged)
        return merged
    out = dyn.copy()  # keeps the dict subclass type
    for k, s in parts:
        out[k] = _merge_elem(dyn.get(k), s)
    return out


def _module_flatten(m: "Module") -> Tuple[Tuple[Any, ...], Tuple[Any, ...]]:
    d = vars(m)
    dyn_keys = []
    dyn_vals = []
    static = []
    cspecs = []
    for k in sorted(d):
        v = d[k]
        if _is_dynamic(v):
            dv, spec = _split_dynamic(v)
            dyn_keys.append(k)
            dyn_vals.append(dv)
            if spec is not None:
                cspecs.append((k, spec))
        else:
            static.append((k, _static_entry(v)))
    return tuple(dyn_vals), (tuple(dyn_keys), tuple(static), tuple(cspecs))


def _module_flatten_with_keys(m: "Module") -> Tuple[Tuple[Any, ...], Tuple[Any, ...]]:
    vals, aux = _module_flatten(m)
    keys = aux[0]
    return tuple((jax.tree_util.GetAttrKey(k), v) for k, v in zip(keys, vals)), aux


def _module_unflatten(cls: type, aux: Tuple[Any, ...], children: Iterable[Any]) -> "Module":
    dyn_keys, static, cspecs = aux
    obj = object.__new__(cls)
    d = obj.__dict__
    for k, v in static:
        d[k] = _unwrap_static(v)
    for k, v in zip(dyn_keys, children):
        d[k] = v
    for k, spec in cspecs:
        d[k] = _merge_dynamic(d[k], spec)
    return obj


class Module:
    """Base class for all stateful components (kernels, likelihoods, models...).

    Subclasses are auto-registered as jax pytrees (see module docstring).
    Mirrors the reference's ``gpflow.Module`` surface
    (``/root/reference/gpflow/base.py:73-110``): ``.parameters``,
    ``.trainable_parameters``, and a notebook-friendly repr via
    ``gpflow_tpu.utilities.print_summary``.
    """

    def __init_subclass__(cls, **kwargs: Any) -> None:
        super().__init_subclass__(**kwargs)
        jax.tree_util.register_pytree_with_keys(
            cls,
            _module_flatten_with_keys,
            lambda aux, children, _cls=cls: _module_unflatten(_cls, aux, children),
            flatten_func=_module_flatten,
        )

    @property
    def name(self) -> str:
        # honors a user-supplied name (stored by subclasses as _name);
        # falls back to the lowercased class name like the reference
        return getattr(self, "_name", None) or type(self).__name__.lower()

    @property
    def parameters(self) -> Tuple[Parameter, ...]:
        leaves = jax.tree_util.tree_leaves(
            self, is_leaf=lambda x: isinstance(x, Parameter)
        )
        return tuple(l for l in leaves if isinstance(l, Parameter))

    @property
    def trainable_parameters(self) -> Tuple[Parameter, ...]:
        return tuple(p for p in self.parameters if p.trainable)

    @property
    def trainable_variables(self) -> Tuple[Parameter, ...]:
        # TF-compatible alias used throughout reference docs.
        return self.trainable_parameters

    def _repr_html_(self) -> str:  # pragma: no cover - notebook nicety
        from .utilities.traversal import tabulate_module_summary

        return "<pre>" + tabulate_module_summary(self) + "</pre>"

    def __repr__(self) -> str:
        try:
            from .utilities.traversal import tabulate_module_summary

            return f"<{type(self).__name__}>\n" + tabulate_module_summary(self)
        except Exception:
            return object.__repr__(self)
