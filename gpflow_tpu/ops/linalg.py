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

__all__ = [
    "chol_and_inverse",
    "cholesky_mm",
    "mvn_logp",
    "sym_jitter",
    "triangular_inverse",
]


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
    traffic breaks XLA's scheduling. Keep the single fusable solve here; the
    STANDALONE large-N contexts (exact-GP gradients) use
    ``_blocked_lower_triangular_inverse`` below instead.)"""
    eye = jnp.eye(L.shape[-1], dtype=L.dtype)
    return solve_triangular(L, jnp.broadcast_to(eye, L.shape), lower=True)


_BLOCK = 512  # diagonal-block size for the recursive-doubling inverse


def _blocked_lower_triangular_inverse(L: jax.Array, block: int = _BLOCK) -> jax.Array:
    """L^-1 for 2-D lower-triangular ``L`` by recursive doubling: invert the
    [n/b] diagonal blocks with ONE batched small solve, then combine pairs in
    log2(n/b) rounds of batched MXU matmuls,

        inv([[A, 0], [B, C]]) = [[A^-1, 0], [-C^-1 B A^-1, C^-1]].

    ~(2/3) n^3 matmul FLOPs replace a latency-bound [n, n]-RHS triangular
    solve — worth it only standalone at large n (exact-GP NLML backward:
    see ``cholesky_mm``), NOT inside the fused SVGP step (docstring above).
    Requires n to be a multiple of ``block`` with n/block a power of two;
    callers fall back to the plain solve otherwise. Matmuls run at HIGHEST
    precision: the inverse feeds gradient pullbacks, where fast-bf16
    rounding would dominate the cond(L)*eps error budget."""
    n = L.shape[-1]
    nb = n // block
    # batched diagonal-block inverse: [nb, b, b]
    blocks = L.reshape(nb, block, nb, block)
    diag = jnp.moveaxis(blocks, 2, 1)[jnp.arange(nb), jnp.arange(nb)]
    inv = solve_triangular(
        diag, jnp.broadcast_to(jnp.eye(block, dtype=L.dtype), diag.shape), lower=True
    )  # [nb, b, b]
    hi = jax.lax.Precision.HIGHEST
    s = block
    while s < n:
        p = n // (2 * s)  # pairs at this level
        # off-diagonal B blocks of the ORIGINAL matrix at this granularity:
        # B_j = L[(2j+1)s:(2j+2)s, 2js:(2j+1)s]
        grid = jnp.moveaxis(L.reshape(n // s, s, n // s, s), 2, 1)
        rows = 2 * jnp.arange(p) + 1
        cols = 2 * jnp.arange(p)
        B = grid[rows, cols]  # [p, s, s]
        A_inv = inv[0::2]  # [p, s, s]
        C_inv = inv[1::2]
        X = -jnp.matmul(C_inv, jnp.matmul(B, A_inv, precision=hi), precision=hi)
        zeros = jnp.zeros_like(X)
        top = jnp.concatenate([A_inv, zeros], axis=-1)
        bottom = jnp.concatenate([X, C_inv], axis=-1)
        inv = jnp.concatenate([top, bottom], axis=-2)  # [p, 2s, 2s]
        s *= 2
    return inv[0]


def _large_triangular_inverse(L: jax.Array) -> jax.Array:
    """Dispatch: blocked recursive doubling when the static shape allows it
    (2-D, n a power-of-two multiple of the block size, n >= 4 blocks),
    else the plain solve."""
    n = L.shape[-1]
    if L.ndim == 2 and n % _BLOCK == 0:
        nb = n // _BLOCK
        if nb >= 4 and (nb & (nb - 1)) == 0:
            return _blocked_lower_triangular_inverse(L)
    return _lower_triangular_inverse_values(L)


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


@jax.custom_vjp
def cholesky_mm(K: jax.Array) -> jax.Array:
    """``cholesky(K)`` with a matmul-dominated pullback for LARGE standalone
    factorizations (the exact-GP NLML backward, SURVEY §3.2).

    XLA's stock Cholesky VJP runs wide [n, n]-RHS triangular solves — at
    n=16384 the GPR value_and_grad measured ~12x the forward. This wrapper's
    backward computes ``L^-1`` ONCE (recursive-doubling blocked inverse when
    the shape allows — batched small solves + log-depth MXU matmuls) and
    evaluates the Cholesky pullback (Murray 2016, eq. 8)

        dK = (1/2) L^-T (P + P^T) L^-1,   P = Phi(L^T dL)

    as matmuls. The inverse is only materialized when gradients actually
    flow; forward-only evaluation is exactly ``jnp.linalg.cholesky``.
    Gradient error grows ~cond(K) * eps from the explicit inverse (the same
    envelope as the INV_SOLVE conditional path, tested in
    tests/gpflow_tpu/test_error_envelopes.py); backward matmul precision is
    pinned (see ``_mvn_logp_bwd``) so the envelope does not widen under the
    FAST_MATMUL speed tier.
    """
    return jnp.linalg.cholesky(K)


def _cholesky_mm_fwd(K: jax.Array) -> Tuple[jax.Array, jax.Array]:
    L = jnp.linalg.cholesky(K)
    return L, L


def _cholesky_mm_bwd(L: jax.Array, dL: jax.Array) -> Tuple[jax.Array]:
    hi = jax.lax.Precision.HIGHEST
    Linv = _large_triangular_inverse(L)
    P = _phi(jnp.matmul(_T(L), dL, precision=hi))
    dK = 0.5 * jnp.matmul(_T(Linv), jnp.matmul(P + _T(P), Linv, precision=hi),
                          precision=hi)
    return (dK,)


cholesky_mm.defvjp(_cholesky_mm_fwd, _cholesky_mm_bwd)


@jax.custom_vjp
def mvn_logp(ks: jax.Array, d: jax.Array) -> jax.Array:
    """[R] log densities log N(d_r | 0, ks) with the ANALYTIC pullback.

    Forward — identical math to ``logdensities.multivariate_normal``:
    one Cholesky + one narrow [n, R] solve. Backward — instead of
    differentiating through the factorization (three [n, n]
    full-precision matmuls via the generic Cholesky pullback, or wide
    [n, n]-RHS triangular solves via XLA's stock VJP), use the closed form

        d logp_r / d ks = 1/2 beta_r beta_r^T - 1/2 ks^-1,
        beta_r = ks^-1 d_r = L^-T alpha_r

    which costs ONE [n, n] matmul (ks^-1 = L^-T L^-1) plus the
    recursive-doubling blocked triangular inverse. Measured at n=16384 f32:
    value_and_grad 1104 ms (stock) -> see PERFORMANCE.md. Backward matmul
    precision is pinned independently of the GPFLOW_TPU_FAST_MATMUL tier
    (HIGH for the [n, n] Kinv product, HIGHEST for the narrow solves — see
    ``_mvn_logp_bwd`` for the measured failure that motivates this).
    Gradient error carries the INV_SOLVE ~cond(ks)*eps envelope
    (tests/gpflow_tpu/test_error_envelopes.py).
    """
    return _mvn_logp_fwd(ks, d)[0]


def _mvn_logp_fwd(
    ks: jax.Array, d: jax.Array
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    L = jnp.linalg.cholesky(ks)
    alpha = solve_triangular(L, d, lower=True)  # [n, R]
    n = ks.shape[-1]
    p = (
        -0.5 * jnp.sum(jnp.square(alpha), axis=0)
        - 0.5 * n * jnp.log(2.0 * jnp.asarray(jnp.pi, dtype=ks.dtype))
        - jnp.sum(jnp.log(jnp.diagonal(L)))
    )
    return p, (L, alpha)


def _mvn_logp_bwd(
    res: Tuple[jax.Array, jax.Array], dp: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    # Precision is pinned UNCONDITIONALLY here — gradient correctness must
    # not depend on the GPFLOW_TPU_FAST_MATMUL speed tier. At the fast tier
    # the Kinv product's bf16 rounding (entries of L^-1 are O(cond) large)
    # made N=16k f32 L-BFGS walk to a 4e9 objective and declare convergence
    # (round-5 bench capture); HIGH (bf16_3x, f32-equivalent accumulation)
    # converges to the same optimum as HIGHEST at ~2/3 the backward cost.
    # beta and the rank-R outer product are narrow — HIGHEST is free there.
    hi = jax.lax.Precision.HIGHEST
    L, alpha = res
    Linv = _large_triangular_inverse(L)
    beta = jnp.matmul(_T(Linv), alpha, precision=hi)  # [n, R] = ks^-1 d
    Kinv = jnp.matmul(_T(Linv), Linv, precision=jax.lax.Precision.HIGH)
    # dks = sum_r dp_r (1/2 beta_r beta_r^T) - (sum_r dp_r) (1/2) Kinv
    bscaled = beta * dp[None, :]
    dks = 0.5 * (jnp.matmul(bscaled, _T(beta), precision=hi) - jnp.sum(dp) * Kinv)
    dd = -bscaled
    return dks, dd


mvn_logp.defvjp(_mvn_logp_fwd, _mvn_logp_bwd)
