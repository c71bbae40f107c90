"""Fused Pallas TPU kernel for the RBF covariance matrix (the kernel hot path,
SURVEY.md §7.1: "Pallas kernels where XLA underperforms: tiled
pairwise-distance/covariance, MXU-aligned 128x tiles").

Computes K = variance * exp(-0.5 * ||x/l - z/l||^2) in one pass: the pairwise
cross term rides the MXU (one [TN, D] @ [D, TM] dot per tile) and the
squared-norm corrections + exp stay in VMEM — the [N, M] distance matrix never
round-trips through HBM in an unfused form.

A custom VJP expresses all gradients as matmuls against W = cotangent * K
(rematerializing K via the same forward kernel), so the backward pass is also
MXU-dominated.

Enabled on TPU for non-float64 dtypes via ``set_pallas_enabled`` /
``GPFLOW_TPU_PALLAS`` (default: auto — on for TPU + f32/bf16, off otherwise;
float64 falls back to XLA since the MXU has no f64 path).
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "pallas_available",
    "rbf_kernel_matrix",
    "scaled_squared_distance",
    "set_pallas_enabled",
]

_TILE_N = 256
_TILE_M = 256

_state = {"enabled": None}  # None = auto


def set_pallas_enabled(value: Optional[bool]) -> None:
    """True/False forces the Pallas path on/off; None restores auto."""
    _state["enabled"] = value


def pallas_available(dtype) -> bool:
    # the kernel computes in f32 internally: float64 must NEVER route here
    # (silent precision loss), regardless of any force-enable flag
    if jnp.dtype(dtype) not in (jnp.float32, jnp.bfloat16):
        return False
    env = os.environ.get("GPFLOW_TPU_PALLAS")
    if env is not None:
        return env not in ("0", "false", "False")
    if _state["enabled"] is not None:
        return bool(_state["enabled"])
    # auto: only on the TPU backend
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover
        return False
    return backend == "tpu"


def _rbf_block_kernel(x_ref, z_ref, xsq_ref, zsq_ref, var_ref, out_ref):
    """One [TN, TM] tile: out = var * exp(-0.5 (xsq - 2 x z^T + zsq))."""
    x = x_ref[:]  # [TN, D]
    z = z_ref[:]  # [TM, D]
    cross = jax.lax.dot_general(
        x, z, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # full f32: bf16 rounding of the
        # cross term breaks the xsq - 2xz + zsq cancellation at small
        # lengthscales (distance errors ~|x|^2 * 4e-3 -> indefinite K)
    )  # [TN, TM]
    d2 = xsq_ref[:] - 2.0 * cross + zsq_ref[:]  # [TN, 1] + [1, TM] broadcasting
    d2 = jnp.maximum(d2, 0.0)
    out_ref[:] = (var_ref[0, 0] * jnp.exp(-0.5 * d2)).astype(out_ref.dtype)


def _pad_to(x: jax.Array, n: int, axis: int) -> jax.Array:
    pad = n - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _rbf_pallas_forward(Xs: jax.Array, Zs: jax.Array, variance: jax.Array,
                        interpret: bool = False) -> jax.Array:
    """Xs: [N, D], Zs: [M, D] pre-scaled by 1/lengthscales; returns [N, M]."""
    from jax.experimental import pallas as pl

    N, D = Xs.shape
    M = Zs.shape[0]
    tn = min(_TILE_N, max(8, -(-N // 8) * 8))
    tm = min(_TILE_M, max(128, -(-M // 128) * 128))
    Np = -(-N // tn) * tn
    Mp = -(-M // tm) * tm

    dtype = jnp.float32
    Xp = _pad_to(Xs.astype(dtype), Np, 0)
    Zp = _pad_to(Zs.astype(dtype), Mp, 0)
    xsq = jnp.sum(jnp.square(Xp), axis=-1, keepdims=True)  # [Np, 1]
    zsq = jnp.sum(jnp.square(Zp), axis=-1, keepdims=True).T  # [1, Mp]
    var = jnp.reshape(variance.astype(dtype), (1, 1))

    grid = (Np // tn, Mp // tm)
    out = pl.pallas_call(
        _rbf_block_kernel,
        out_shape=jax.ShapeDtypeStruct((Np, Mp), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, D), lambda i, j: (i, 0)),
            pl.BlockSpec((tm, D), lambda i, j: (j, 0)),
            pl.BlockSpec((tn, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((1, tm), lambda i, j: (0, j)),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tn, tm), lambda i, j: (i, j)),
        interpret=interpret,
    )(Xp, Zp, xsq, zsq, var)
    return out[:N, :M]


@jax.custom_vjp
def _rbf_scaled(Xs: jax.Array, Zs: jax.Array, variance: jax.Array) -> jax.Array:
    return _rbf_pallas_forward(Xs, Zs, variance)


def _rbf_scaled_fwd(Xs, Zs, variance):
    K = _rbf_pallas_forward(Xs, Zs, variance)
    return K, (Xs, Zs, variance, K)


def _rbf_scaled_bwd(res, g):
    """All-matmul backward: W = g * K;
    dXs = (rowsum(W) * Xs - W @ Zs);  dZs = (colsum(W) * Zs - W^T @ Xs);
    dvar = sum(W * K) / variance  (K = var * E => dK/dvar = K / var).
    Note dK/dXs = K * (Zs - Xs) elementwise-per-pair, which contracts to the
    two matmuls above."""
    Xs, Zs, variance, K = res
    W = g * K  # [N, M]
    row = jnp.sum(W, axis=1, keepdims=True)  # [N, 1]
    col = jnp.sum(W, axis=0, keepdims=True)  # [1, M]
    dXs = W @ Zs - row * Xs
    dZs = W.T @ Xs - col.T * Zs
    dvar = jnp.sum(W) / variance  # dK/dvar = K / var and W already holds g * K
    return dXs.astype(Xs.dtype), dZs.astype(Zs.dtype), jnp.reshape(dvar, jnp.shape(variance)).astype(variance.dtype)


_rbf_scaled.defvjp(_rbf_scaled_fwd, _rbf_scaled_bwd)


def rbf_kernel_matrix(
    X: jax.Array,
    Z: jax.Array,
    lengthscales: jax.Array,
    variance: jax.Array,
) -> jax.Array:
    """K[i, j] = variance * exp(-0.5 ||(X_i - Z_j) / lengthscales||^2),
    differentiable w.r.t. all inputs."""
    Xs = X / lengthscales
    Zs = Z / lengthscales
    return _rbf_scaled(Xs, Zs, jnp.asarray(variance))


def scaled_squared_distance(Xs: jax.Array, Zs: jax.Array, interpret: bool = False) -> jax.Array:
    """||xs - zs||^2 via the fused tile kernel (= -2 log(K/var) with var=1)."""
    E = _rbf_pallas_forward(Xs, Zs, jnp.asarray(1.0, jnp.float32), interpret=interpret)
    return -2.0 * jnp.log(jnp.maximum(E, 1e-38))
