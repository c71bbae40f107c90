"""Factorization composites with matmul-only backward passes.

On TPU the MXU makes matmuls far cheaper than triangular solves of the same
shape, but the stock autodiff rules for ``cholesky`` and ``solve_triangular``
emit *more* triangular solves in the backward pass. The conditionals' fast
path (``GPFLOW_TPU_INV_SOLVE``) already materializes ``L^-1`` in the forward
pass; these custom-VJP wrappers reuse it so that every backward operation is
a plain matmul:

* ``triangular_inverse(L)``: forward is one [M, M] triangular solve against
  the identity; backward is ``-L^-T dX L^-T`` projected to the lower
  triangle (two matmuls, zero solves).
* ``chol_and_inverse(K)``: forward is ``cholesky`` + ``triangular_inverse``;
  backward folds both cotangents into the classic Cholesky pullback
  (Murray 2016, "Differentiation of the Cholesky decomposition",
  arXiv:1602.07527) evaluated with the already-computed ``L^-1`` —
  four matmuls, zero solves.

Both support arbitrary leading batch dimensions.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

__all__ = ["chol_and_inverse", "sym_jitter", "triangular_inverse"]


def _T(x: jax.Array) -> jax.Array:
    return jnp.swapaxes(x, -1, -2)


def sym_jitter(A: jax.Array) -> jax.Array:
    """Symmetrize (+ relative diagonal jitter in low precision) before a
    Cholesky whose input is positive (semi-)definite in exact arithmetic but
    is assembled from solves/matmuls rather than as an explicit Gram product
    (e.g. L^-1 psi2 L^-T, the natural-gradient conversions): f32 rounding at
    large matrix norms makes such products marginally indefinite. The jitter
    is relative to the mean diagonal so it is scale-invariant, and zero in
    f64 so double-precision parity paths are untouched."""
    A = 0.5 * (A + _T(A))
    if A.dtype == jnp.float64:
        return A
    n = A.shape[-1]
    scale = jnp.mean(jnp.abs(jnp.diagonal(A, axis1=-2, axis2=-1)), axis=-1)
    eps = 1e-5 * scale[..., None, None]
    return A + eps * jnp.eye(n, dtype=A.dtype)


def _lower_triangular_inverse_values(L: jax.Array) -> jax.Array:
    """Value-level L^-1 [..., M, M] via one triangular solve against the
    identity. (A recursive-doubling blocked variant — batched diagonal-block
    solve + log-depth matmuls — measures ~2.5x faster in isolation at M=2048
    but LOSES ~10% end-to-end inside the fused SVGP step: the slice/concat
    traffic breaks XLA's scheduling. Keep the single fusable solve.)"""
    eye = jnp.eye(L.shape[-1], dtype=L.dtype)
    return solve_triangular(L, jnp.broadcast_to(eye, L.shape), lower=True)


def _phi(x: jax.Array) -> jax.Array:
    """Lower triangle with the diagonal halved (the Cholesky pullback's
    projection operator)."""
    return jnp.tril(x) - 0.5 * _diag_part(x)


def _diag_part(x: jax.Array) -> jax.Array:
    eye = jnp.eye(x.shape[-1], dtype=x.dtype)
    return x * eye


@jax.custom_vjp
def triangular_inverse(L: jax.Array) -> jax.Array:
    """Inverse of a lower-triangular matrix [..., M, M].

    Identical values to ``solve_triangular(L, I)``, but the backward pass is
    two matmuls instead of a triangular solve.
    """
    return _triangular_inverse_fwd(L)[0]


def _triangular_inverse_fwd(L: jax.Array) -> Tuple[jax.Array, jax.Array]:
    Linv = _lower_triangular_inverse_values(L)
    return Linv, Linv


def _triangular_inverse_bwd(Linv: jax.Array, dLinv: jax.Array) -> Tuple[jax.Array]:
    # d(L^-1)/dL: dL = -L^-T dLinv L^-T, restricted to the lower triangle
    # (solve_triangular never reads the upper triangle of L).
    dL = -jnp.matmul(_T(Linv), jnp.matmul(dLinv, _T(Linv)))
    return (jnp.tril(dL),)


triangular_inverse.defvjp(_triangular_inverse_fwd, _triangular_inverse_bwd)


@jax.custom_vjp
def chol_and_inverse(K: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(L, L^-1) for symmetric positive-definite K [..., M, M].

    Forward: one Cholesky + one [M, M] triangular solve. Backward: four
    matmuls (no solves) — both cotangents are pulled back through the
    Cholesky with the already-available ``L^-1``.
    """
    return _chol_and_inverse_fwd(K)[0]


def _chol_and_inverse_fwd(
    K: jax.Array,
) -> Tuple[Tuple[jax.Array, jax.Array], Tuple[jax.Array, jax.Array]]:
    L = jnp.linalg.cholesky(K)
    Linv = _lower_triangular_inverse_values(L)
    return (L, Linv), (L, Linv)


def _chol_and_inverse_bwd(
    res: Tuple[jax.Array, jax.Array], cots: Tuple[jax.Array, jax.Array]
) -> Tuple[jax.Array]:
    L, Linv = res
    dL, dLinv = cots
    # fold the L^-1 cotangent into an equivalent L cotangent:
    # d(L^-1) = -L^-1 dL L^-1  =>  dL += tril(-L^-T dLinv L^-T)
    dL = dL + jnp.tril(-jnp.matmul(_T(Linv), jnp.matmul(dLinv, _T(Linv))))
    # Cholesky pullback (Murray 2016, eq. 8):
    #   dK = (1/2) L^-T (P + P^T) L^-1,  P = Phi(L^T dL)
    P = _phi(jnp.matmul(_T(L), dL))
    dK = 0.5 * jnp.matmul(_T(Linv), jnp.matmul(P + _T(P), Linv))
    return (dK,)


chol_and_inverse.defvjp(_chol_and_inverse_fwd, _chol_and_inverse_bwd)
