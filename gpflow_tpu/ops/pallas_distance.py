"""Fused Pallas TPU kernels for stationary covariance matrices (the kernel
hot path, SURVEY.md §7.1: "Pallas kernels where XLA underperforms: tiled
pairwise-distance/covariance, MXU-aligned 128x tiles").

Computes K = variance * h(||x/l - z/l||^2) in one pass for the isotropic
families (RBF, Exponential, Matern 1/2, 3/2, 5/2): the pairwise cross term
rides the MXU (one [TN, D] @ [D, TM] dot per tile) and the squared-norm
corrections + elementwise tail h stay in VMEM — the [N, M] distance matrix
never round-trips through HBM in an unfused form.

A custom VJP expresses all gradients as matmuls against W = cotangent *
variance * h'(d2): for RBF, h' is proportional to h so W comes from the saved
K; the other families rematerialize h'(d2) with a second fused tile kernel.

Enabled on TPU for non-float64 dtypes via ``set_pallas_enabled`` /
``GPFLOW_TPU_PALLAS`` (default: auto — on for TPU + f32/bf16, off otherwise;
float64 falls back to XLA since the MXU has no f64 path).
"""
from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "PALLAS_FAMILIES",
    "pallas_available",
    "rbf_kernel_matrix",
    "scaled_squared_distance",
    "set_pallas_enabled",
    "stationary_kernel_matrix",
]

_TILE_N = 256
_TILE_M = 256

PALLAS_FAMILIES = ("rbf", "exponential", "matern12", "matern32", "matern52", "rq")

_state = {"enabled": None}  # None = auto


def set_pallas_enabled(value: Optional[bool]) -> None:
    """True/False forces the Pallas path on/off; None restores auto."""
    _state["enabled"] = value


def get_pallas_enabled() -> Optional[bool]:
    """Current programmatic override (True/False), or None for auto."""
    return _state["enabled"]


def pallas_available(dtype: object) -> bool:
    # the kernel computes in f32 internally: float64 must NEVER route here
    # (silent precision loss), regardless of any force-enable flag
    if jnp.dtype(dtype) not in (jnp.float32, jnp.bfloat16):
        return False
    # the PROGRAMMATIC override wins over the env var: export_serving etc.
    # force the XLA path temporarily (symbolic shapes cannot trace through
    # the MXU tile padding) and must not be vetoed by GPFLOW_TPU_PALLAS=1
    if _state["enabled"] is not None:
        return bool(_state["enabled"])
    env = os.environ.get("GPFLOW_TPU_PALLAS")
    if env is not None:
        return env not in ("0", "false", "False")
    # auto: only on the TPU backend
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover
        return False
    return backend == "tpu"


def _tail_value(family: str, d2: jax.Array, alpha: jax.Array = None) -> jax.Array:
    """h(d2) with K = variance * h(d2); d2 is the scaled squared distance.
    The sqrt is clipped at 1e-36 exactly like the reference
    (``stationaries.py:114``) so r-based families match the XLA path.
    ``alpha`` is the RationalQuadratic shape parameter (unused otherwise)."""
    if family == "rbf":
        return jnp.exp(-0.5 * d2)
    if family == "rq":
        return jnp.exp(-alpha * jnp.log1p(0.5 * d2 / alpha))
    r = jnp.sqrt(jnp.maximum(d2, 1e-36))
    if family == "exponential":
        return jnp.exp(-0.5 * r)
    if family == "matern12":
        return jnp.exp(-r)
    if family == "matern32":
        s = math.sqrt(3.0)
        return (1.0 + s * r) * jnp.exp(-s * r)
    if family == "matern52":
        s = math.sqrt(5.0)
        return (1.0 + s * r + (5.0 / 3.0) * d2) * jnp.exp(-s * r)
    raise ValueError(f"Unknown stationary family: {family}")


def _tail_grad(family: str, d2: jax.Array, alpha: jax.Array = None) -> jax.Array:
    """dh/d(d2), analytic per family (Matern 3/2 and 5/2 are smooth at r=0;
    the r^-1 factor for Exponential/Matern 1/2 inherits the same 1e-36 sqrt
    clip as the XLA autodiff path)."""
    if family == "rbf":
        return -0.5 * jnp.exp(-0.5 * d2)
    if family == "rq":
        # d/dd2 (1 + d2/(2a))^-a = -0.5 * (1 + d2/(2a))^(-a-1)
        return -0.5 * jnp.exp(-(alpha + 1.0) * jnp.log1p(0.5 * d2 / alpha))
    r = jnp.sqrt(jnp.maximum(d2, 1e-36))
    if family == "exponential":
        return -jnp.exp(-0.5 * r) / (4.0 * r)
    if family == "matern12":
        return -jnp.exp(-r) / (2.0 * r)
    if family == "matern32":
        s = math.sqrt(3.0)
        return -1.5 * jnp.exp(-s * r)
    if family == "matern52":
        s = math.sqrt(5.0)
        return -(5.0 / 6.0) * (1.0 + s * r) * jnp.exp(-s * r)
    raise ValueError(f"Unknown stationary family: {family}")


def _d2_tile(x_ref, z_ref, xsq_ref, zsq_ref) -> jax.Array:
    cross = jax.lax.dot_general(
        x_ref[:], z_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # full f32: bf16 rounding of the
        # cross term breaks the xsq - 2xz + zsq cancellation at small
        # lengthscales (distance errors ~|x|^2 * 4e-3 -> indefinite K)
    )  # [TN, TM]
    d2 = xsq_ref[:] - 2.0 * cross + zsq_ref[:]  # [TN, 1] + [1, TM] broadcasting
    return jnp.maximum(d2, 0.0)


def _value_block_kernel(family, x_ref, z_ref, xsq_ref, zsq_ref, var_ref, alpha_ref, out_ref):
    """One [TN, TM] tile: out = var * h(d2)."""
    d2 = _d2_tile(x_ref, z_ref, xsq_ref, zsq_ref)
    out_ref[:] = (var_ref[0, 0] * _tail_value(family, d2, alpha_ref[0, 0])).astype(out_ref.dtype)


def _wgrad_block_kernel(family, x_ref, z_ref, xsq_ref, zsq_ref, var_ref, alpha_ref, g_ref, out_ref):
    """One [TN, TM] tile of the VJP weight: out = g * var * h'(d2)."""
    d2 = _d2_tile(x_ref, z_ref, xsq_ref, zsq_ref)
    out_ref[:] = (g_ref[:] * (var_ref[0, 0] * _tail_grad(family, d2, alpha_ref[0, 0]))).astype(out_ref.dtype)


def _pad_to(x: jax.Array, n: int, axis: int) -> jax.Array:
    pad = n - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _tiling(N: int, M: int):
    tn = min(_TILE_N, max(8, -(-N // 8) * 8))
    tm = min(_TILE_M, max(128, -(-M // 128) * 128))
    return tn, tm, -(-N // tn) * tn, -(-M // tm) * tm


def _stationary_pallas_forward(family: str, Xs: jax.Array, Zs: jax.Array,
                               variance: jax.Array, alpha: Optional[jax.Array] = None,
                               interpret: bool = False) -> jax.Array:
    """Xs: [N, D], Zs: [M, D] pre-scaled by 1/lengthscales; returns [N, M]."""
    from jax.experimental import pallas as pl

    N, D = Xs.shape
    M = Zs.shape[0]
    tn, tm, Np, Mp = _tiling(N, M)

    dtype = jnp.float32
    Xp = _pad_to(Xs.astype(dtype), Np, 0)
    Zp = _pad_to(Zs.astype(dtype), Mp, 0)
    xsq = jnp.sum(jnp.square(Xp), axis=-1, keepdims=True)  # [Np, 1]
    zsq = jnp.sum(jnp.square(Zp), axis=-1, keepdims=True).T  # [1, Mp]
    var = jnp.reshape(variance.astype(dtype), (1, 1))
    a = jnp.reshape((alpha if alpha is not None else jnp.asarray(1.0)).astype(dtype), (1, 1))

    out = pl.pallas_call(
        functools.partial(_value_block_kernel, family),
        out_shape=jax.ShapeDtypeStruct((Np, Mp), dtype),
        grid=(Np // tn, Mp // tm),
        in_specs=[
            pl.BlockSpec((tn, D), lambda i, j: (i, 0)),
            pl.BlockSpec((tm, D), lambda i, j: (j, 0)),
            pl.BlockSpec((tn, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((1, tm), lambda i, j: (0, j)),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0)),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tn, tm), lambda i, j: (i, j)),
        interpret=interpret,
    )(Xp, Zp, xsq, zsq, var, a)
    return out[:N, :M]


def _stationary_pallas_wgrad(family: str, Xs: jax.Array, Zs: jax.Array,
                             variance: jax.Array, g: jax.Array,
                             interpret: bool = False) -> jax.Array:
    """W = g * variance * h'(d2), rematerializing d2 tile-by-tile."""
    from jax.experimental import pallas as pl

    N, D = Xs.shape
    M = Zs.shape[0]
    tn, tm, Np, Mp = _tiling(N, M)

    dtype = jnp.float32
    Xp = _pad_to(Xs.astype(dtype), Np, 0)
    Zp = _pad_to(Zs.astype(dtype), Mp, 0)
    gp = _pad_to(_pad_to(g.astype(dtype), Np, 0), Mp, 1)
    xsq = jnp.sum(jnp.square(Xp), axis=-1, keepdims=True)
    zsq = jnp.sum(jnp.square(Zp), axis=-1, keepdims=True).T
    var = jnp.reshape(variance.astype(dtype), (1, 1))
    a = jnp.reshape(jnp.asarray(1.0, dtype), (1, 1))  # families here have no alpha

    out = pl.pallas_call(
        functools.partial(_wgrad_block_kernel, family),
        out_shape=jax.ShapeDtypeStruct((Np, Mp), dtype),
        grid=(Np // tn, Mp // tm),
        in_specs=[
            pl.BlockSpec((tn, D), lambda i, j: (i, 0)),
            pl.BlockSpec((tm, D), lambda i, j: (j, 0)),
            pl.BlockSpec((tn, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((1, tm), lambda i, j: (0, j)),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0)),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0)),
            pl.BlockSpec((tn, tm), lambda i, j: (i, j)),
        ],
        out_specs=pl.BlockSpec((tn, tm), lambda i, j: (i, j)),
        interpret=interpret,
    )(Xp, Zp, xsq, zsq, var, a, gp)
    return out[:N, :M]


def _stationary_bwd_from_w(Xs, Zs, variance, K, W, g):
    """dXs/dZs/dvar from the VJP weight W = g * var * h'(d2).

    d(d2)/dXs_i = 2 (Xs_i - Zs_j) per pair, which contracts to two matmuls;
    dK/dvar = K / var, so dvar reuses the saved K."""
    row = jnp.sum(W, axis=1, keepdims=True)  # [N, 1]
    col = jnp.sum(W, axis=0, keepdims=True)  # [1, M]
    dXs = 2.0 * (row * Xs - W @ Zs)
    dZs = 2.0 * (col.T * Zs - W.T @ Xs)
    dvar = jnp.sum(g * K) / variance
    return (
        dXs.astype(Xs.dtype),
        dZs.astype(Zs.dtype),
        jnp.reshape(dvar, jnp.shape(variance)).astype(variance.dtype),
    )


@functools.lru_cache(maxsize=None)
def _make_stationary(family: str):
    @jax.custom_vjp
    def fn(Xs, Zs, variance):
        return _stationary_pallas_forward(family, Xs, Zs, variance)

    def fwd(Xs, Zs, variance):
        K = _stationary_pallas_forward(family, Xs, Zs, variance)
        return K, (Xs, Zs, variance, K)

    def bwd(res, g):
        Xs, Zs, variance, K = res
        if family == "rbf":
            # h' = -h/2, so the weight comes straight from the saved K
            W = -0.5 * (g * K)
        else:
            W = _stationary_pallas_wgrad(family, Xs, Zs, variance, g)
        return _stationary_bwd_from_w(Xs, Zs, variance, K, W, g)

    fn.defvjp(fwd, bwd)
    return fn


@jax.custom_vjp
def _rq_scaled(Xs, Zs, variance, alpha):
    return _stationary_pallas_forward("rq", Xs, Zs, variance, alpha)


def _rq_fwd(Xs, Zs, variance, alpha):
    K = _stationary_pallas_forward("rq", Xs, Zs, variance, alpha)
    return K, (Xs, Zs, variance, alpha, K)


def _rq_bwd(res, g):
    # Everything is recoverable elementwise from the saved K:
    # with u = d2/(2 alpha), K/var = (1+u)^-alpha, so
    #   1+u   = (K/var)^(-1/alpha)
    #   h'    = -0.5 (1+u)^(-alpha-1)  =>  W = g var h' = -0.5 g K / (1+u)
    #   dK/dalpha = K (u/(1+u) - log1p(u))
    Xs, Zs, variance, alpha, K = res
    ratio = jnp.maximum(K / variance, 1e-38)
    one_plus_u = jnp.exp(-jnp.log(ratio) / alpha)
    u = one_plus_u - 1.0
    W = -0.5 * (g * K) / one_plus_u
    dXs, dZs, dvar = _stationary_bwd_from_w(Xs, Zs, variance, K, W, g)
    dalpha = jnp.sum(g * K * (u / one_plus_u - jnp.log(one_plus_u)))
    return dXs, dZs, dvar, jnp.reshape(dalpha, jnp.shape(alpha)).astype(alpha.dtype)


_rq_scaled.defvjp(_rq_fwd, _rq_bwd)


def stationary_kernel_matrix(
    X: jax.Array,
    Z: jax.Array,
    lengthscales: jax.Array,
    variance: jax.Array,
    family: str = "rbf",
    alpha: Optional[jax.Array] = None,
) -> jax.Array:
    """K[i, j] = variance * h(||(X_i - Z_j) / lengthscales||^2) for the given
    isotropic family, differentiable w.r.t. all array inputs. ``alpha`` is
    the RationalQuadratic shape parameter (family="rq" only)."""
    if family not in PALLAS_FAMILIES:
        raise ValueError(f"Unknown stationary family: {family}")
    Xs = X / lengthscales
    Zs = Z / lengthscales
    if family == "rq":
        if alpha is None:
            raise ValueError("family='rq' requires alpha")
        return _rq_scaled(Xs, Zs, jnp.asarray(variance), jnp.asarray(alpha))
    return _make_stationary(family)(Xs, Zs, jnp.asarray(variance))


def rbf_kernel_matrix(
    X: jax.Array,
    Z: jax.Array,
    lengthscales: jax.Array,
    variance: jax.Array,
) -> jax.Array:
    """K[i, j] = variance * exp(-0.5 ||(X_i - Z_j) / lengthscales||^2),
    differentiable w.r.t. all inputs."""
    return stationary_kernel_matrix(X, Z, lengthscales, variance, family="rbf")


# --- back-compat aliases used by tests / older call sites -------------------


def _rbf_pallas_forward(Xs, Zs, variance, interpret: bool = False):
    return _stationary_pallas_forward("rbf", Xs, Zs, variance, interpret=interpret)


def _rbf_scaled_fwd(Xs, Zs, variance):
    K = _stationary_pallas_forward("rbf", Xs, Zs, variance)
    return K, (Xs, Zs, variance, K)


def _rbf_scaled_bwd(res, g):
    Xs, Zs, variance, K = res
    W = -0.5 * (g * K)
    return _stationary_bwd_from_w(Xs, Zs, variance, K, W, g)


def scaled_squared_distance(Xs: jax.Array, Zs: jax.Array, interpret: bool = False) -> jax.Array:
    """||xs - zs||^2 for pre-scaled inputs, computed DIRECTLY.

    Not routed through the exp tile kernel: recovering d2 as
    ``-2 log(exp(-d2/2))`` in f32 clamps every distance beyond ~175
    (underflow) and drowns near-zero distances in ~1e-7 round-trip noise
    (round-2 review). The direct cross-term form matches the tile kernel's
    own in-kernel distance math (full-precision matmul + row/col norms).
    """
    del interpret  # kept for signature compatibility
    from ..utilities.ops import square_distance

    return square_distance(Xs, Zs)
