"""Scipy optimizer wrapper (reference ``/root/reference/gpflow/optimizers/scipy.py``).

Same design as the reference: pack trainable Parameters' *unconstrained*
values into one flat float64 vector, hand scipy.optimize.minimize (default
L-BFGS-B) a jit-compiled value-and-grad function, unpack the optimum back
into the parameters. The host<->device boundary is one flat vector per
iteration, exactly as in the reference (``scipy.py:292-331``); the loss+grad
graph is compiled once and reused every step.

Functionalization: the user's ``closure`` reads parameters through captured
``Parameter`` objects. During tracing we temporarily swap each parameter's
unconstrained array for the traced value and restore afterwards — this makes
any closure differentiable without requiring a particular model structure.
"""
from __future__ import annotations

import warnings
from collections import OrderedDict
from typing import Any, Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.optimize

from ..base import Parameter, functionalize
from ..bijectors import TriangularMask
from ..monitor import Monitor

__all__ = ["Scipy"]


def _tril_indices(shape: Tuple[int, ...]) -> Tuple[np.ndarray, np.ndarray]:
    n = shape[-1]
    return np.tril_indices(n)


class _ParameterCodec:
    """Flattens a parameter's unconstrained value for scipy; parameters with a
    TriangularMask transform pack only the lower-triangle entries, so L-BFGS
    never carries the permanently-zero upper-triangle dimensions.

    Two layouts exist:

    * the PACKED layout (what scipy sees): tril parameters contribute
      n(n+1)/2 entries per matrix;
    * the FULL layout (what the device function sees): every parameter is
      its plain row-major flattening.

    The packed<->full conversion is pure index shuffling and runs ON HOST in
    numpy (``unpack``/``pack``, microseconds for ~1e5 entries). The traced
    ``decode_jax``/``encode_jax`` only ever slice-and-reshape the FULL
    vector: putting the triangle gather/scatter inside the jitted
    value-and-grad instead made XLA's fusion pass explode — 415 s compile
    and 66 ms/eval for a [10, 100, 100] q_sqrt SVGP on TPU v5e, vs 31 s and
    0.5 ms with the layout shuffle on host. Bytes are not a concern: the
    full vector upload is the same single round-trip."""

    def __init__(self, variables: Sequence[Parameter]) -> None:
        self._init_from_specs(
            [tuple(np.shape(v.unconstrained_variable)) for v in variables],
            [isinstance(v.transform, TriangularMask) for v in variables],
        )

    @classmethod
    def from_specs(
        cls, shapes: Sequence[Tuple[int, ...]], tril: Sequence[bool]
    ) -> "_ParameterCodec":
        codec = cls.__new__(cls)
        codec._init_from_specs(list(shapes), list(tril))
        return codec

    def _init_from_specs(self, shapes: list, tril: list) -> None:
        self.shapes = shapes
        self.tril = tril
        self.sizes = []  # packed entry counts (scipy layout)
        self.full_sizes = []  # row-major entry counts (device layout)
        self._pack_idx: dict = {}  # n -> [P] int32 into the flattened matrix
        for shape, tri in zip(self.shapes, self.tril):
            full = int(np.prod(shape)) if shape else 1
            self.full_sizes.append(full)
            if tri:
                n = shape[-1]
                batch = int(np.prod(shape[:-2])) if shape[:-2] else 1
                self.sizes.append(batch * n * (n + 1) // 2)
                if n not in self._pack_idx:
                    rows, cols = np.tril_indices(n)
                    self._pack_idx[n] = (rows * n + cols).astype(np.int32)
            else:
                self.sizes.append(full)
        self.has_tril = any(self.tril)

    def unpack(self, x: np.ndarray) -> np.ndarray:
        """Host-side packed -> full layout (zeros in the strict upper
        triangles). Identity when no parameter is triangular."""
        if not self.has_tril:
            return x
        out = np.zeros(sum(self.full_sizes), dtype=x.dtype)
        i = j = 0
        for shape, tri, size, full_size in zip(
            self.shapes, self.tril, self.sizes, self.full_sizes
        ):
            chunk = x[i : i + size]
            i += size
            if tri:
                n = shape[-1]
                dest = out[j : j + full_size].reshape(-1, n * n)
                dest[:, self._pack_idx[n]] = chunk.reshape(dest.shape[0], -1)
            else:
                out[j : j + full_size] = chunk
            j += full_size
        return out

    def pack(self, x_full: np.ndarray) -> np.ndarray:
        """Host-side full -> packed layout (drops the strict upper
        triangles). Identity when no parameter is triangular."""
        if not self.has_tril:
            return x_full
        out = np.empty(sum(self.sizes), dtype=x_full.dtype)
        i = j = 0
        for shape, tri, size, full_size in zip(
            self.shapes, self.tril, self.sizes, self.full_sizes
        ):
            chunk = x_full[j : j + full_size]
            j += full_size
            if tri:
                n = shape[-1]
                out[i : i + size] = chunk.reshape(-1, n * n)[
                    :, self._pack_idx[n]
                ].reshape(-1)
            else:
                out[i : i + size] = chunk
            i += size
        return out

    def encode(self, arrays: Sequence[np.ndarray]) -> np.ndarray:
        flat = []
        for a, shape, tri in zip(arrays, self.shapes, self.tril):
            a = np.asarray(a, dtype=np.float64)
            if tri:
                rows, cols = _tril_indices(shape)
                flat.append(a[..., rows, cols].reshape(-1))
            else:
                flat.append(a.reshape(-1))
        if not flat:
            return np.zeros((0,), dtype=np.float64)
        return np.concatenate(flat)

    def decode(self, x: np.ndarray) -> List[np.ndarray]:
        out = []
        i = 0
        for shape, tri, size in zip(self.shapes, self.tril, self.sizes):
            chunk = x[i : i + size]
            i += size
            if tri:
                n = shape[-1]
                rows, cols = _tril_indices(shape)
                full = np.zeros(shape, dtype=np.float64)
                full[..., rows, cols] = chunk.reshape(shape[:-2] + (len(rows),))
                out.append(full)
            else:
                out.append(chunk.reshape(shape))
        return out

    def decode_jax(self, x: jax.Array) -> List[jax.Array]:
        """Traceable decode of the FULL-layout vector (see class docstring):
        pure slice+reshape, so the jitted value-and-grad sees one input array
        and one host->device transfer per evaluation."""
        out = []
        i = 0
        for shape, size in zip(self.shapes, self.full_sizes):
            out.append(x[i : i + size].reshape(shape))
            i += size
        return out

    def encode_jax(self, arrays: Sequence[jax.Array], dtype: Any) -> jax.Array:
        """Traceable encode into the FULL layout: flattens per-parameter
        gradients into one array so the device returns a single download."""
        flat = [jnp.asarray(a, dtype=dtype).reshape(-1) for a in arrays]
        if not flat:
            return jnp.zeros((0,), dtype=dtype)
        return jnp.concatenate(flat)

def _find_unused_inputs(fn: Callable[..., Any], example: Tuple[Any, ...]) -> List[int]:
    """Indices of ``example`` leaves with no GRADIENT path to the traced
    ``fn(example)`` output: backward reachability over the jaxpr from the
    output vars, with ``stop_gradient`` edges cut (a variable consumed only
    through stop_gradient has identically-zero gradients — the reference's
    TF check reports exactly those, ``scipy.py:229-253``). Conservative for
    sub-jaxpr calls (scan/cond/pjit): any reachable call eqn marks all its
    inputs reachable."""
    from jax.extend.core import Literal

    closed = jax.make_jaxpr(fn)(example)
    jaxpr = closed.jaxpr
    producers = {}
    for eqn in jaxpr.eqns:
        for v in eqn.outvars:
            producers[v] = eqn
    reachable = set()
    stack = [v for v in jaxpr.outvars if not isinstance(v, Literal)]
    while stack:
        v = stack.pop()
        if v in reachable:
            continue
        reachable.add(v)
        eqn = producers.get(v)
        if eqn is None:
            continue  # an input var or constvar: nothing upstream
        if eqn.primitive.name == "stop_gradient":
            continue  # gradient edge cut: upstream vars get zero cotangents
        for iv in eqn.invars:
            if not isinstance(iv, Literal):
                stack.append(iv)
    return [i for i, v in enumerate(jaxpr.invars) if v not in reachable]


LossClosure = Callable[[], jax.Array]
Variables = Sequence[Parameter]  # deprecated alias, import-level parity (ref ``scipy.py:41``)
StepCallback = Callable[[int, Sequence[Parameter], Sequence[np.ndarray]], None]


class Scipy:
    def __init__(self, compile_cache_size: int = 2) -> None:
        """:param compile_cache_size: number of compiled loss-and-gradient
        functions cached across ``minimize`` calls (reference
        ``scipy.py:47-70``). A repeat call with the same ``closure``
        (bound methods compare equal), the same Parameter objects, and the
        same ``allow_unused_variables`` reuses the jitted function and the
        unused-variable analysis instead of re-tracing. 0 disables caching.

        CAVEAT (same as the reference's cache): only Parameter values are
        traced arguments — everything else the closure reads (notably
        ``model.data``) is baked in as a trace-time CONSTANT. If non-Parameter
        state changes between calls (e.g. a BO loop growing the dataset via
        a model REBUILD keeps ids fresh and is safe, but mutating
        ``model.data`` in place is not), use a fresh ``Scipy()`` instance or
        ``compile_cache_size=0`` so the loss is re-traced."""
        if compile_cache_size < 0:
            raise ValueError(
                f"The 'compile_cache_size' argument must be non-negative, got {compile_cache_size}."
            )
        self.compile_cache: "OrderedDict[Tuple[Any, ...], Tuple[Callable[..., Any], List[int]]]" = (
            OrderedDict()
        )
        self.compile_cache_size = compile_cache_size

    def __getstate__(self) -> dict:
        # compiled functions don't pickle (reference ``scipy.py:72-76``)
        state = self.__dict__.copy()
        state["compile_cache"] = OrderedDict()
        return state

    def minimize(
        self,
        closure: LossClosure,
        variables: Sequence[Parameter],
        method: str = "L-BFGS-B",
        step_callback: Optional[StepCallback] = None,
        compile: bool = True,
        allow_unused_variables: bool = False,
        track_loss_history: bool = False,
        nonfinite_penalty: Optional[float] = None,
        **scipy_kwargs: Any,
    ) -> "scipy.optimize.OptimizeResult":
        """Minimizes ``closure()`` w.r.t. ``variables``
        (reference ``scipy.py:78-168``).

        :param closure: () -> scalar loss, reading the current values of
            ``variables`` (e.g. ``model.training_loss``).
        :param variables: Parameters to optimize (``model.trainable_variables``).
        :param method: scipy method, default "L-BFGS-B".
        :param step_callback: called once per optimizer *iteration* (not per
            function evaluation) as ``(step, variables, values)`` where
            ``values`` are the current unconstrained arrays; a ``Monitor``
            instance is called as ``monitor(step)`` (reference
            ``scipy.py:256-273``).
        :param compile: jit-compile the loss-and-gradient evaluation.
        :param track_loss_history: record the loss at each iteration and
            return it as ``result.loss_history`` (reference
            ``scipy.py:154-164,276-290``). Costs one extra (jitted)
            loss-and-gradient evaluation per iteration, as in the reference.
        :param nonfinite_penalty: if set (e.g. ``1e15``), evaluations whose
            loss or gradient comes back non-finite return this value (auto-
            raised to 10x the largest finite |loss| seen, so it can never
            read as an improvement) with a zero gradient instead — the
            Armijo test then rejects the trial
            point and the line search backtracks into the finite region,
            where scipy's L-BFGS-B would otherwise abort the whole run with
            ``status=2 ABNORMAL`` on the first NaN. No reference analog
            (float64 TF rarely NaNs); in float32 on TPU an aggressive trial
            step can round a Gram matrix indefinite (Cholesky -> NaN) at
            hyperparameters the optimizer never accepts. The number of
            guarded evaluations is returned as
            ``result.n_nonfinite_evals``. Off by default: silently eating
            NaNs would mask real numerics bugs in parity work.
        :param scipy_kwargs: forwarded to scipy.optimize.minimize (e.g.
            options={"maxiter": 1000}). Prefer ``step_callback`` over
            scipy's raw ``callback``.
        """
        if not callable(closure):
            raise TypeError("The 'closure' argument is expected to be a callable object.")
        variables = tuple(variables)
        if not all(isinstance(v, Parameter) for v in variables):
            raise TypeError("The 'variables' argument is expected to only contain Parameters.")

        codec = _ParameterCodec(variables)
        initial_params = codec.encode(
            [np.asarray(v.unconstrained_variable) for v in variables]
        )

        func = self.eval_func(
            closure,
            variables,
            codec,
            compile=compile,
            allow_unused_variables=allow_unused_variables,
        )

        n_nonfinite = [0]
        if nonfinite_penalty is not None:
            inner_func = func
            seen_finite = [False]
            max_abs_loss = [0.0]
            best_finite: list = [None]  # (loss, x.copy()) of the best finite eval

            def func(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
                loss, grad = inner_func(x)
                if not (np.isfinite(loss) and np.all(np.isfinite(grad))):
                    if not seen_finite[0]:
                        # The guard exists for NaN line-search TRIALS. A
                        # non-finite loss at the starting point is a broken
                        # model, and returning (penalty, zero-grad) there
                        # would make L-BFGS-B declare instant "convergence"
                        # (projected gradient 0) with success=True at the
                        # unusable initial parameters.
                        raise FloatingPointError(
                            "Loss or gradient is non-finite at the initial "
                            "parameters; nonfinite_penalty only guards "
                            "line-search trial points. Fix the model/"
                            "initialization (jitter, noise floor, dtype) "
                            "instead."
                        )
                    n_nonfinite[0] += 1
                    # The penalty must DOMINATE every finite loss seen, or
                    # it becomes an attractor: with current loss 1e16 and a
                    # fixed 1e15 penalty, a NaN trial would pass both Wolfe
                    # tests (lower f, zero directional derivative) and be
                    # ACCEPTED as the new iterate — L-BFGS-B would then
                    # declare success inside the NaN region. Scaling by the
                    # largest |finite loss| keeps rejection unconditional.
                    pen = max(float(nonfinite_penalty), 10.0 * max_abs_loss[0])
                    return (
                        np.asarray(pen, dtype=np.float64),
                        np.zeros_like(grad),
                    )
                seen_finite[0] = True
                max_abs_loss[0] = max(max_abs_loss[0], abs(float(loss)))
                if best_finite[0] is None or float(loss) < best_finite[0][0]:
                    best_finite[0] = (float(loss), np.array(x, copy=True))
                return loss, grad

        if step_callback is not None:
            if "callback" in scipy_kwargs:
                raise ValueError("Callback passed both via `step_callback` and `callback`")
            scipy_kwargs["callback"] = self.callback_func(variables, step_callback, codec)
        history: List[np.ndarray] = []
        if track_loss_history:
            scipy_kwargs["callback"] = self.loss_history_callback_func(
                func, history, scipy_kwargs.get("callback")
            )

        result = scipy.optimize.minimize(
            func, initial_params, jac=True, method=method, **scipy_kwargs
        )

        if track_loss_history:
            result["loss_history"] = history
        if nonfinite_penalty is not None:
            result["n_nonfinite_evals"] = n_nonfinite[0]
            # On an abnormal line-search exit scipy can hand back a
            # PENALIZED iterate (fun == the penalty, x inside the non-finite
            # region); never assign that into the model — restore the best
            # finite point actually evaluated instead.
            if best_finite[0] is not None and (
                not np.isfinite(result.fun) or result.fun > best_finite[0][0]
            ):
                result["fun"] = best_finite[0][0]
                result["x"] = best_finite[0][1]
        # assign the optimum back into the parameters
        for v, val in zip(variables, codec.decode(np.asarray(result.x))):
            v.assign_unconstrained(jnp.asarray(val, dtype=v.dtype))
        return result

    def initial_parameters(self, variables: Sequence[Parameter]) -> np.ndarray:
        return _ParameterCodec(variables).encode(
            [np.asarray(v.unconstrained_variable) for v in variables]
        )

    def eval_func(
        self,
        closure: LossClosure,
        variables: Sequence[Parameter],
        codec: Optional[_ParameterCodec] = None,
        compile: bool = True,
        allow_unused_variables: bool = False,
    ) -> Callable[[np.ndarray], Tuple[np.ndarray, np.ndarray]]:
        if codec is None:
            codec = _ParameterCodec(variables)
        dtypes = [v.dtype for v in variables]

        cache_key: Optional[Tuple[Any, ...]]
        try:
            cache_key = (closure, tuple(id(v) for v in variables), compile)
            hit = self.compile_cache.get(cache_key)
        except TypeError:  # unhashable closure: skip caching
            cache_key, hit = None, None

        if hit is not None:
            self.compile_cache.move_to_end(cache_key)
            flat_value_and_grad, unused = hit
        else:
            loss_fn = functionalize(closure, variables)
            value_and_grad = jax.value_and_grad(loss_fn)

            # Decode/encode run INSIDE the compiled function: scipy's flat
            # vector is the only upload and (loss, flat grad) the only
            # download per evaluation. The previous per-leaf jnp.asarray /
            # np.asarray boundary cost one network round-trip PER PARAMETER
            # on a tunneled TPU (measured 154 ms/eval for a 3-parameter GPR
            # at ~31 ms RTT — 5 round-trips; this path needs 2).
            def flat_value_and_grad(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
                unconstrained = tuple(
                    jnp.asarray(u, dtype=d)
                    for u, d in zip(codec.decode_jax(x), dtypes)
                )
                loss, grads = value_and_grad(unconstrained)
                return loss, codec.encode_jax(grads, x.dtype)

            if compile:
                flat_value_and_grad = jax.jit(flat_value_and_grad)

            # Unconnected-variable check (reference ``scipy.py:229-253``):
            # trace the loss once and find input leaves that no equation
            # consumes. Structural, not value-based — a variable passed into
            # a sub-jaxpr (scan/cond) counts as used even if zero-gradient
            # at the optimum.
            unused = _find_unused_inputs(
                loss_fn, tuple(jnp.asarray(v.unconstrained_variable) for v in variables)
            )
            if cache_key is not None and self.compile_cache_size > 0:
                while len(self.compile_cache) >= self.compile_cache_size:
                    self.compile_cache.popitem(last=False)  # evict oldest
                self.compile_cache[cache_key] = (flat_value_and_grad, unused)
        if unused:
            names = [variables[i].name for i in unused]
            if allow_unused_variables:
                warnings.warn(
                    f"Some variables do not affect the loss and will keep "
                    f"zero gradients: {names}"
                )
            else:
                raise ValueError(
                    f"Some variables do not affect the loss: {names}. Their "
                    "gradients would silently stay zero under L-BFGS; pass "
                    "allow_unused_variables=True to proceed anyway."
                )

        def _eval(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
            # host-side layout shuffle (packed -> full), then one upload; the
            # loss and flat gradient come back in a single device->host
            # transfer and are packed back on host (see _ParameterCodec)
            x_full = codec.unpack(np.asarray(x, dtype=np.float64))
            loss, grad = jax.device_get(flat_value_and_grad(jnp.asarray(x_full)))
            return (
                np.asarray(loss, dtype=np.float64),
                codec.pack(np.asarray(grad, dtype=np.float64)),
            )

        return _eval

    @staticmethod
    def callback_func(
        variables: Sequence[Parameter],
        step_callback: StepCallback,
        codec: Optional[_ParameterCodec] = None,
    ) -> Callable[..., None]:
        """Adapts a ``step_callback`` to scipy's per-iteration ``callback``
        (reference ``scipy.py:256-273``): counts iterations, decodes the flat
        vector back into per-parameter unconstrained arrays, and calls a
        ``Monitor`` with just the step index."""
        if codec is None:
            codec = _ParameterCodec(variables)
        step = [0]

        def _callback(x: Any, *_args: Any) -> None:
            xvec = np.asarray(getattr(x, "x", x))  # scipy may pass OptimizeResult
            # Sync the CURRENT iterate into the live Parameters before the
            # callback runs: Monitor tasks (ModelToTensorBoard, ...) read the
            # model directly, and the final assignment otherwise only happens
            # after scipy returns — every logged value would be the initial
            # one (round-2 review; reference assigns on every evaluation).
            decoded = codec.decode(xvec)
            for v, val in zip(variables, decoded):
                v.assign_unconstrained(jnp.asarray(val, dtype=v.dtype))
            if isinstance(step_callback, Monitor):
                step_callback(step[0])
            else:
                step_callback(step[0], variables, decoded)
            step[0] += 1

        return _callback

    @staticmethod
    def loss_history_callback_func(
        minimize_func: Callable[[np.ndarray], Tuple[np.ndarray, np.ndarray]],
        history: List[np.ndarray],
        callback: Optional[Callable[..., None]] = None,
    ) -> Callable[..., None]:
        """Per-iteration loss recording, chained after an existing callback
        (reference ``scipy.py:276-290``). Re-evaluates the jitted
        loss-and-gradient at the iterate, exactly as the reference does."""

        def _callback(x: Any, *args: Any) -> None:
            if callback is not None:
                # forward extra positional args — some scipy methods
                # (trust-constr) call back with (xk, state)
                callback(x, *args)
            xvec = np.asarray(getattr(x, "x", x))
            history.append(minimize_func(xvec)[0])

        return _callback

    @staticmethod
    def pack_tensors(tensors: Sequence[Any]) -> np.ndarray:
        """Concatenation of flattened arrays (reference ``scipy.py:292-296``).
        Accepts Parameters (their unconstrained value is used) or plain
        arrays. Uses the SAME vector layout as ``minimize``'s flat vector
        (``result.x`` / ``initial_parameters``): Parameters with a
        TriangularMask transform contribute only their lower-triangle
        entries, so ``unpack_tensors(variables, result.x)`` round-trips.
        Delegates to the same ``_ParameterCodec`` that builds ``minimize``'s
        vector, so there is exactly ONE implementation of the layout."""
        pairs = [Scipy._unconstrained_and_tril(t) for t in tensors]
        codec = _ParameterCodec.from_specs(
            [tuple(a.shape) for a, _ in pairs], [tri for _, tri in pairs]
        )
        return codec.encode([a for a, _ in pairs])

    @staticmethod
    def unpack_tensors(to_tensors: Sequence[Any], from_vector: Any) -> List[np.ndarray]:
        """Splits a flat vector (in ``pack_tensors``/``minimize`` layout)
        back into arrays shaped like ``to_tensors`` (reference
        ``scipy.py:298-312``); tril-packed segments are scattered back into
        full matrices with a zero upper triangle. Delegates to
        ``_ParameterCodec.decode`` (the single layout implementation)."""
        pairs = [Scipy._unconstrained_and_tril(t) for t in to_tensors]
        codec = _ParameterCodec.from_specs(
            [tuple(a.shape) for a, _ in pairs], [tri for _, tri in pairs]
        )
        decoded = codec.decode(np.asarray(from_vector))
        return [d.astype(a.dtype) for d, (a, _) in zip(decoded, pairs)]

    @staticmethod
    def _unconstrained_and_tril(t: Any) -> Tuple[np.ndarray, bool]:
        if isinstance(t, Parameter):
            return (
                np.asarray(t.unconstrained_variable),
                isinstance(t.transform, TriangularMask),
            )
        return np.asarray(t), False

    @staticmethod
    def assign_tensors(to_tensors: Sequence[Parameter], values: Sequence[Any]) -> None:
        """Assigns each value to the matching Parameter's *unconstrained*
        variable (reference ``scipy.py:314-319`` assigns tf.Variables, which
        hold the unconstrained state there too)."""
        if len(to_tensors) != len(values):
            raise ValueError("to_tensors and values should have same length")
        for target, value in zip(to_tensors, values):
            target.assign_unconstrained(jnp.asarray(value, dtype=target.dtype))
