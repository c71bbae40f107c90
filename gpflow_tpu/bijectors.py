"""In-house bijector library (replaces TFP bijectors used by the reference).

The reference builds parameter transforms from ``tfp.bijectors``
(``/root/reference/gpflow/utilities/bijectors.py:27-55``). Our TPU-native rebuild
uses a small set of pure-functional, *hashable* bijectors: they are stored in
the static (aux) part of ``Parameter`` pytrees, so the same transform instance
compares equal across jit traces and never triggers recompilation.

Every bijector maps unconstrained -> constrained with:
  * ``forward(x)``                      constrain
  * ``inverse(y)``                      unconstrain
  * ``forward_log_det_jacobian(x)``     elementwise log|dy/dx| (callers sum)
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Bijector",
    "Chain",
    "Exp",
    "FillTriangular",
    "Identity",
    "Shift",
    "Sigmoid",
    "Softplus",
    "TriangularMask",
    "positive",
    "triangular",
    "triangular_size",
]


@dataclasses.dataclass(frozen=True)
class Bijector:
    """Base class. Subclasses are frozen dataclasses => hashable/eq by value."""

    def forward(self, x: jax.Array) -> jax.Array:
        raise NotImplementedError

    def inverse(self, y: jax.Array) -> jax.Array:
        raise NotImplementedError

    def forward_log_det_jacobian(self, x: jax.Array) -> jax.Array:
        raise NotImplementedError

    # Host (NumPy) evaluation, used at Parameter construction/assign/display
    # time so model building never touches the device — on remote-attached
    # chips every eager op costs an RPC (and possibly a remote compile).
    # Defaults fall back to the jnp implementation (device roundtrip);
    # the in-house bijectors all override with pure-numpy math.
    def forward_np(self, x: np.ndarray) -> np.ndarray:
        return np.asarray(self.forward(x))

    def inverse_np(self, y: np.ndarray) -> np.ndarray:
        return np.asarray(self.inverse(y))

    @property
    def name(self) -> str:
        return type(self).__name__.lower()


@dataclasses.dataclass(frozen=True)
class Identity(Bijector):
    def forward(self, x: jax.Array) -> jax.Array:
        return x

    def inverse(self, y: jax.Array) -> jax.Array:
        return y

    def forward_np(self, x: np.ndarray) -> np.ndarray:
        return np.asarray(x)

    def inverse_np(self, y: np.ndarray) -> np.ndarray:
        return np.asarray(y)

    def forward_log_det_jacobian(self, x: jax.Array) -> jax.Array:
        return jnp.zeros_like(x)


@dataclasses.dataclass(frozen=True)
class Exp(Bijector):
    def forward(self, x: jax.Array) -> jax.Array:
        return jnp.exp(x)

    def inverse(self, y: jax.Array) -> jax.Array:
        return jnp.log(y)

    def forward_np(self, x: np.ndarray) -> np.ndarray:
        return np.exp(x)

    def inverse_np(self, y: np.ndarray) -> np.ndarray:
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.log(y)

    def forward_log_det_jacobian(self, x: jax.Array) -> jax.Array:
        return x


def _softplus(x: jax.Array) -> jax.Array:
    return jnp.logaddexp(x, 0.0)


def _softplus_inv(y: jax.Array) -> jax.Array:
    # log(e^y - 1), stable for large and small y: y + log(1 - e^{-y}) = y + log(-expm1(-y))
    return y + jnp.log(-jnp.expm1(-y))


@dataclasses.dataclass(frozen=True)
class Softplus(Bijector):
    def forward(self, x: jax.Array) -> jax.Array:
        return _softplus(x)

    def inverse(self, y: jax.Array) -> jax.Array:
        return _softplus_inv(y)

    def forward_np(self, x: np.ndarray) -> np.ndarray:
        return np.logaddexp(x, 0.0)

    def inverse_np(self, y: np.ndarray) -> np.ndarray:
        with np.errstate(divide="ignore", invalid="ignore"):
            return y + np.log(-np.expm1(-y))

    def forward_log_det_jacobian(self, x: jax.Array) -> jax.Array:
        # d/dx softplus(x) = sigmoid(x); log sigmoid(x) = -softplus(-x)
        return -_softplus(-x)


@dataclasses.dataclass(frozen=True)
class Shift(Bijector):
    shift: float = 0.0

    def forward(self, x: jax.Array) -> jax.Array:
        return x + self.shift

    def inverse(self, y: jax.Array) -> jax.Array:
        return y - self.shift

    def forward_np(self, x: np.ndarray) -> np.ndarray:
        return np.asarray(x + self.shift)

    def inverse_np(self, y: np.ndarray) -> np.ndarray:
        return np.asarray(y - self.shift)

    def forward_log_det_jacobian(self, x: jax.Array) -> jax.Array:
        return jnp.zeros_like(x)


@dataclasses.dataclass(frozen=True)
class Sigmoid(Bijector):
    """Maps R -> (low, high)."""

    low: float = 0.0
    high: float = 1.0

    def forward(self, x: jax.Array) -> jax.Array:
        return self.low + (self.high - self.low) * jax.nn.sigmoid(x)

    def inverse(self, y: jax.Array) -> jax.Array:
        z = (y - self.low) / (self.high - self.low)
        return jnp.log(z) - jnp.log1p(-z)

    def forward_np(self, x: np.ndarray) -> np.ndarray:
        # stable for all x: both where-branches stay finite (a naive
        # exp(-x)/exp(x) split overflows and warns under np.where's
        # evaluate-both semantics)
        e = np.exp(-np.abs(x))
        sig = np.where(x >= 0, 1.0 / (1.0 + e), e / (1.0 + e))
        return np.asarray(self.low + (self.high - self.low) * sig)

    def inverse_np(self, y: np.ndarray) -> np.ndarray:
        z = (y - self.low) / (self.high - self.low)
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.asarray(np.log(z) - np.log1p(-z))

    def forward_log_det_jacobian(self, x: jax.Array) -> jax.Array:
        return (
            jnp.log(self.high - self.low) - _softplus(-x) - _softplus(x)
        )


@dataclasses.dataclass(frozen=True)
class Chain(Bijector):
    """Applies ``bijectors`` right-to-left like TFP: forward = b[0](b[1](...(x)))."""

    bijectors: Tuple[Bijector, ...]

    def forward(self, x: jax.Array) -> jax.Array:
        for b in reversed(self.bijectors):
            x = b.forward(x)
        return x

    def inverse(self, y: jax.Array) -> jax.Array:
        for b in self.bijectors:
            y = b.inverse(y)
        return y

    def forward_log_det_jacobian(self, x: jax.Array) -> jax.Array:
        ldj = jnp.zeros_like(x)
        for b in reversed(self.bijectors):
            ldj = ldj + b.forward_log_det_jacobian(x)
            x = b.forward(x)
        return ldj

    def forward_np(self, x: np.ndarray) -> np.ndarray:
        for b in reversed(self.bijectors):
            x = b.forward_np(x)
        return x

    def inverse_np(self, y: np.ndarray) -> np.ndarray:
        for b in self.bijectors:
            y = b.inverse_np(y)
        return y


def _tri_n(m: int) -> int:
    n = int(round((np.sqrt(8.0 * m + 1.0) - 1.0) / 2.0))
    if triangular_size(n) != m:
        raise ValueError(f"Last dimension {m} is not a triangular number")
    return n


def _fill_triangular(x: jax.Array) -> jax.Array:
    """Packed vector [..., n(n+1)/2] -> lower-triangular [..., n, n].

    Uses the concat/reverse/reshape construction (as in
    ``tfp.math.fill_triangular``) instead of a scatter: on TPU a scatter of
    n(n+1)/2 elements costs ~10ms at n=2048 while this is pure data movement
    that XLA fuses. The packing order is therefore TFP's, not row-major;
    ``_fill_triangular_inverse`` is its exact inverse.
    """
    m = x.shape[-1]
    n = _tri_n(m)
    tail = x[..., n:]
    xc = jnp.concatenate([tail, x[..., ::-1]], axis=-1)  # [..., n*n]
    y = jnp.reshape(xc, x.shape[:-1] + (n, n))
    return jnp.tril(y)


def _fill_triangular_inverse(y: jax.Array) -> jax.Array:
    """Exact inverse of ``_fill_triangular`` (static gather; only used at
    parameter construction/assign time, never in the jit hot path)."""
    n = y.shape[-1]
    m = triangular_size(n)
    # simulate the forward construction on indices to recover the permutation
    idx = np.arange(m)
    xc = np.concatenate([idx[n:], idx[::-1]])
    packed_at_slot = xc.reshape(n, n)  # which packed index landed at [i, j]
    rows, cols = np.tril_indices(n)
    perm = packed_at_slot[rows, cols]  # tril slot s holds packed element perm[s]
    inv_perm = np.argsort(perm)
    tri_vals = y[..., rows, cols]
    return tri_vals[..., inv_perm]


@dataclasses.dataclass(frozen=True)
class FillTriangular(Bijector):
    """Vector <-> lower-triangular matrix; volume preserving (ldj = 0).

    Reference uses ``tfp.bijectors.FillTriangular`` for ``q_sqrt``
    (``utilities/bijectors.py:48-52``).
    """

    def forward(self, x: jax.Array) -> jax.Array:
        return _fill_triangular(x)

    def inverse(self, y: jax.Array) -> jax.Array:
        return _fill_triangular_inverse(y)

    def forward_np(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x)
        n = _tri_n(x.shape[-1])
        xc = np.concatenate([x[..., n:], x[..., ::-1]], axis=-1)
        return np.tril(xc.reshape(x.shape[:-1] + (n, n)))

    def inverse_np(self, y: np.ndarray) -> np.ndarray:
        return np.asarray(_fill_triangular_inverse(np.asarray(y)))

    def forward_log_det_jacobian(self, x: jax.Array) -> jax.Array:
        return jnp.zeros(x.shape[:-1], dtype=x.dtype)


@dataclasses.dataclass(frozen=True)
class TriangularMask(Bijector):
    """Square matrix <-> its lower triangle via masking.

    The TPU-native triangular parametrization: the unconstrained value is the
    FULL [..., n, n] matrix and ``forward`` is one ``jnp.tril`` select. The
    reference's packed-vector ``FillTriangular`` costs ~5ms per unpack at
    n=2048 on TPU (the reverse+concat+reshape is a full memory relayout),
    whereas masking is a single fused elementwise op. Upper-triangle entries
    receive zero gradient, so they stay at their initial zeros under any
    gradient-based optimizer; ldj = 0 on the lower triangle.
    """

    def forward(self, x: jax.Array) -> jax.Array:
        return jnp.tril(x)

    def inverse(self, y: jax.Array) -> jax.Array:
        return jnp.tril(y)

    def forward_np(self, x: np.ndarray) -> np.ndarray:
        return np.tril(x)

    def inverse_np(self, y: np.ndarray) -> np.ndarray:
        return np.tril(y)

    def forward_log_det_jacobian(self, x: jax.Array) -> jax.Array:
        return jnp.zeros(x.shape[:-2], dtype=x.dtype)


def positive(lower: float | None = None, base: str | None = None) -> Bijector:
    """Returns a positivity-enforcing bijector (reference
    ``utilities/bijectors.py:27-45``): ``shift(lower) o {softplus|exp}``.

    :param lower: overrides ``config.default_positive_minimum()``.
    :param base: overrides ``config.default_positive_bijector()`` ("softplus"|"exp").
    """
    from .config import default_positive_bijector, default_positive_minimum

    bijector: Bijector
    name = (base if base is not None else default_positive_bijector()).lower()
    if name == "softplus":
        bijector = Softplus()
    elif name == "exp":
        bijector = Exp()
    else:
        raise ValueError(f"Unknown positive bijector {name!r}")
    shift = lower if lower is not None else default_positive_minimum()
    if shift != 0.0:
        bijector = Chain((Shift(float(shift)), bijector))
    return bijector


def triangular() -> TriangularMask:
    """Returns the triangular transform used for q_sqrt-style parameters
    (reference ``utilities/bijectors.py:48`` returns FillTriangular).

    Deviation: the unconstrained storage is the full square matrix masked by
    ``jnp.tril`` rather than a packed vector — see ``TriangularMask`` for the
    TPU rationale. ``FillTriangular`` remains available for packed storage.
    """
    return TriangularMask()


# Shape contract applied post-definition: importing ``utilities.shapes`` at
# the top of this module would cycle through ``utilities/__init__`` ->
# ``utilities/bijectors`` -> back here before ``positive``/``triangular_size``
# exist. At module bottom every name is defined, so the re-entrant alias
# import succeeds regardless of which side is imported first.
from .utilities.shapes import check_shapes as _check_shapes  # noqa: E402


@_check_shapes(
    "n: []",
    "return: []",
)
def triangular_size(n: int) -> int:
    """Number of free entries of an n x n lower-triangular matrix
    (reference ``utilities/bijectors.py:55-63``). Defined down here so the
    contract decorator can import ``utilities.shapes`` after every name the
    re-entrant ``utilities/bijectors`` alias import needs already exists."""
    return n * (n + 1) // 2
