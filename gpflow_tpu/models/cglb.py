"""CGLB: conjugate-gradient lower bound on the GP marginal likelihood
(Artemev et al. 2021; reference ``/root/reference/gpflow/models/cglb.py``).

The CG loop is a ``jax.lax.while_loop`` with the same NamedTuple state and
stop_gradient semantics as the reference's ``tf.while_loop`` (SURVEY.md §7.1).
Note the reference updates the cached auxiliary vector ``v`` as a side effect
of evaluating the objective; here the assignment happens eagerly outside jit
and is skipped under tracing (pure-function deviation — the bound itself is
identical, only the warm-start caching differs under jit).
"""
from __future__ import annotations

from typing import Any, Callable, List, NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import solve_triangular

from ..base import InputData, MeanAndVariance, Parameter, RegressionData, TensorType
from ..utilities.shapes import check_shapes, inherit_check_shapes
from ..config import default_float
from ..covariances import Kuf
from ..utilities import add_noise_cov, assert_params_false
from .sgpr import SGPR_deprecated as SGPR

__all__ = ["CGLB", "NystromPreconditioner", "cglb_conjugate_gradient"]


class CGLB(SGPR):
    """SGPR with a tighter Jensen-corrected logdet bound and a CG-estimated
    quadratic term (reference ``cglb.py:30-282``)."""

    @check_shapes(
        "data[0]: [N, D]",
        "data[1]: [N, P]",
    )
    def __init__(
        self,
        data: RegressionData,
        *args: Any,
        cg_tolerance: float = 1.0,
        max_cg_iters: int = 100,
        restart_cg_iters: int = 40,
        v_grad_optimization: bool = False,
        matrix_free_chunk: Optional[int] = None,
        **kwargs: Any,
    ) -> None:
        """:param matrix_free_chunk: if set, never materialize the [N, N]
        kernel matrix: every K-matvec (CG iterations, the quadratic-form bound,
        the prediction residual) is computed in row chunks of this size with
        rematerialization, so training memory is O(N * chunk) — the TPU-native
        route to exact-GP-bound training at N far beyond HBM."""
        super().__init__(data, *args, **kwargs)
        self._matrix_free_chunk = matrix_free_chunk
        n, b = self.data[1].shape
        self._v = Parameter(
            np.zeros((b, n), dtype=default_float()), trainable=v_grad_optimization, name="v"
        )
        self._cg_tolerance = cg_tolerance
        self._max_cg_iters = max_cg_iters
        self._restart_cg_iters = restart_cg_iters

    @property  # type: ignore[misc]
    @check_shapes("return: [P, N]")
    def aux_vec(self) -> Parameter:
        return self._v

    def _kmat_operator(self):
        """(K + sigma^2 I) as a matvec: a dense array in the default mode, a
        chunked closure in matrix-free mode (v [R, N] -> v @ (K + s2 I))."""
        x, _ = self.data
        sigma_sq = self.likelihood.variance.value
        if self._matrix_free_chunk is None:
            return add_noise_cov(self.kernel.K(x), sigma_sq)

        chunk = self._matrix_free_chunk
        n, d = x.shape
        pad = (-n) % chunk
        xp = jnp.pad(x, ((0, pad), (0, 0)))
        xch = xp.reshape((n + pad) // chunk, chunk, d)
        kernel = self.kernel

        def mv(v: jax.Array) -> jax.Array:
            # columns of K built chunk-by-chunk; jax.checkpoint recomputes the
            # [N, chunk] kernel blocks in the backward pass instead of saving
            # them (which would silently re-materialize the full [N, N])
            @jax.checkpoint
            def body(xc: jax.Array) -> jax.Array:
                return v @ kernel.K(x, xc)  # [R, chunk]

            parts = jax.lax.map(body, xch)  # [nc, R, chunk]
            out = jnp.moveaxis(parts, 0, 1).reshape(v.shape[0], n + pad)[:, :n]
            return out + sigma_sq * v

        return mv

    @check_shapes("return: []")
    def logdet_term(self, common: SGPR.CommonTensors) -> jax.Array:
        """log|K + s2 I| <= log|Q + s2 I| + n log(1 + tr(K-Q)/(s2 n))
        (reference ``cglb.py:82-114``)."""
        LB = common.LB
        AAT = common.AAT
        x, y = self.data
        num_data = jnp.asarray(y.shape[0], default_float())
        output_dim = jnp.asarray(y.shape[1], default_float())
        sigma_sq = self.likelihood.variance.value

        kdiag = self.kernel(x, full_cov=False)
        trace = jnp.sum(kdiag) / sigma_sq - jnp.sum(jnp.diag(AAT))
        logdet_b = jnp.sum(jnp.log(jnp.diag(LB)))
        logsigma_sq = num_data * jnp.log(sigma_sq)
        logtrace = num_data * jnp.log(1 + trace / num_data)
        return -output_dim * (logdet_b + 0.5 * logsigma_sq + 0.5 * logtrace)

    @check_shapes("return: []")
    def quad_term(self, common: SGPR.CommonTensors) -> jax.Array:
        """-0.5 (v.(r + 0.5 K v) + 0.5 r^T Q^-1 r) bound on -0.5 y^T K^-1 y
        via the auxiliary vector v (reference ``cglb.py:116-170``)."""
        x, y = self.data
        err = y - self.mean_function(x)
        sigma_sq = self.likelihood.variance.value
        K = self._kmat_operator()

        A = common.A
        LB = common.LB
        preconditioner = NystromPreconditioner(A, LB, sigma_sq)
        err_t = jnp.transpose(err)

        v_init = self.aux_vec
        if not v_init.trainable:
            v = cglb_conjugate_gradient(
                K,
                err_t,
                v_init.value,
                preconditioner,
                self._cg_tolerance,
                self._max_cg_iters,
                self._restart_cg_iters,
            )
        else:
            v = v_init.value

        Kv = v @ K if not callable(K) else K(v)
        r = err_t - Kv
        _, error_bound_cols = preconditioner(r)  # per-column [R]
        # lb = v.err - 0.5 v^T (K + s2 I) v, with the PSD quadratic forms
        # clamped one-sided for float32 safety: when CG returns a huge-norm
        # v (near-null-space directions of Qff at small noise), the kernel
        # part of v^T K_hat v — true value >= 0 — can round NEGATIVE under
        # catastrophic cancellation, which INFLATES the "lower bound" above
        # the evidence and lets an optimizer climb pure rounding error
        # (observed at N=32k f32: a +2.9e7 "bound" vs a 8.1e4 Titsias upper
        # bound). Clamping v^T K v at 0 and adding the exactly-computable
        # s2 ||v||^2 only ever LOWERS lb, so validity is preserved; in
        # float64 (parity mode) both clamps are no-ops. Same one-sided
        # guard on the preconditioner quadratic r^T Q^-1 r >= 0.
        sq = jnp.asarray(sigma_sq, v.dtype)
        v_norm_sq = jnp.sum(jnp.square(v), axis=-1)  # [R]
        vKv_kernel = jnp.maximum(
            jnp.sum(v * Kv, axis=-1) - sq * v_norm_sq, 0.0
        )
        lb = jnp.sum(v * err_t) - 0.5 * jnp.sum(vKv_kernel + sq * v_norm_sq)
        ub = lb + 0.5 * jnp.sum(jnp.maximum(error_bound_cols, 0.0))

        if not v_init.trainable and not isinstance(v, jax.core.Tracer):
            v_init.assign(v)

        return -ub

    @inherit_check_shapes
    def predict_f(
        self,
        Xnew: InputData,
        full_cov: bool = False,
        full_output_cov: bool = False,
        cg_tolerance: Optional[float] = 1e-3,
    ) -> MeanAndVariance:
        """m(xs) = K_sf v + Q_ff Q^-1 r; SGPR variance
        (reference ``cglb.py:172-253``)."""
        assert_params_false(self.predict_f, full_output_cov=full_output_cov)

        x, y = self.data
        err = y - self.mean_function(x)
        ksf = self.kernel(Xnew, x)
        sigma_sq = self.likelihood.variance.value
        sigma = jnp.sqrt(sigma_sq)
        iv = self.inducing_variable
        kernel = self.kernel

        kmat = self._kmat_operator()

        common = self._common_calculation()
        A, LB, L = common.A, common.LB, common.L

        v = self.aux_vec.value
        if cg_tolerance is not None:
            preconditioner = NystromPreconditioner(A, LB, sigma_sq)
            err_t = jnp.transpose(err)
            v = cglb_conjugate_gradient(
                kmat,
                err_t,
                v,
                preconditioner,
                cg_tolerance,
                self._max_cg_iters,
                self._restart_cg_iters,
            )

        cg_mean = ksf @ jnp.transpose(v)
        res = err - (jnp.transpose(kmat(v)) if callable(kmat) else kmat @ jnp.transpose(v))

        Kus = Kuf(iv, kernel, Xnew)
        Ares = A @ res
        c = solve_triangular(LB, Ares, lower=True) / sigma
        tmp1 = solve_triangular(L, Kus, lower=True)
        tmp2 = solve_triangular(LB, tmp1, lower=True)
        sgpr_mean = tmp2.T @ c

        if full_cov:
            var = kernel(Xnew) + tmp2.T @ tmp2 - tmp1.T @ tmp1
            var = jnp.broadcast_to(var[None, ...], (self.num_latent_gps,) + var.shape)
        else:
            var = (
                kernel(Xnew, full_cov=False)
                + jnp.sum(jnp.square(tmp2), 0)
                - jnp.sum(jnp.square(tmp1), 0)
            )
            var = jnp.broadcast_to(var[:, None], var.shape + (self.num_latent_gps,))

        mean = sgpr_mean + cg_mean + self.mean_function(Xnew)
        return mean, var

    @inherit_check_shapes
    def predict_y(
        self,
        Xnew: InputData,
        full_cov: bool = False,
        full_output_cov: bool = False,
        cg_tolerance: Optional[float] = 1e-3,
    ) -> MeanAndVariance:
        assert_params_false(self.predict_y, full_cov=full_cov, full_output_cov=full_output_cov)
        f_mean, f_var = self.predict_f(
            Xnew, full_cov=full_cov, full_output_cov=full_output_cov, cg_tolerance=cg_tolerance
        )
        return self.likelihood.predict_mean_and_var(Xnew, f_mean, f_var)

    @inherit_check_shapes
    def predict_log_density(
        self,
        data: RegressionData,
        full_cov: bool = False,
        full_output_cov: bool = False,
        cg_tolerance: Optional[float] = 1e-3,
    ) -> jax.Array:
        assert_params_false(
            self.predict_log_density, full_cov=full_cov, full_output_cov=full_output_cov
        )
        x, y = data
        f_mean, f_var = self.predict_f(
            x, full_cov=full_cov, full_output_cov=full_output_cov, cg_tolerance=cg_tolerance
        )
        return self.likelihood.predict_log_density(x, f_mean, f_var, y)


class NystromPreconditioner:
    """Q = (Q_ff + s2 I)^-1 applied via A = s^-1 L^-1 Kux and LB
    (reference ``cglb.py:296-339``)."""

    @check_shapes(
        "A: [M, N]",
        "LB: [M, M]",
    )
    def __init__(self, A: jax.Array, LB: jax.Array, sigma_sq: TensorType) -> None:
        self.A = A
        self.LB = LB
        self.sigma_sq = sigma_sq

    @check_shapes(
        "v: [B, N]",
        "return[0]: [B, N]",
        # deviation from the reference's scalar (cglb.py:313-317): the CG here
        # is batched over the B right-hand sides, so v^T Q^-1 v is per-column
        "return[1]: [B]",
    )
    def __call__(self, v: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Returns (v^T Q^-1 as a row-vector batch [R, N], and the
        PER-COLUMN quadratics v_r^T Q^-1 v_r as [R]). Per-column (not
        summed like the reference ``cglb.py:330-339``) so the CG below can
        run an independent step size per right-hand side — the reference's
        shared scalar makes its CG silently unsound for R > 1."""
        sigma_sq = self.sigma_sq
        A = self.A
        LB = self.LB

        vt = jnp.transpose(v)
        Av = A @ vt
        LBinvAv = solve_triangular(LB, Av, lower=True)
        LBinvtLBinvAv = solve_triangular(jnp.transpose(LB), LBinvAv, lower=False)

        rv = vt - A.T @ LBinvtLBinvAv
        vtrv = jnp.sum(rv * vt, axis=0)  # [R]
        return jnp.transpose(rv) / sigma_sq, vtrv / sigma_sq


@check_shapes(
    "b: [B, N]",
    "initial: [B, N]",
    "return: [B, N]",
)
def cglb_conjugate_gradient(
    K: Union[jax.Array, Callable[[jax.Array], jax.Array]],
    b: jax.Array,
    initial: jax.Array,
    preconditioner: NystromPreconditioner,
    cg_tolerance: float,
    max_steps: int,
    restart_cg_step: int,
) -> jax.Array:
    """Preconditioned CG with periodic restarts, stopping when
    0.5 r^T Q^-1 r <= cg_tolerance (reference ``cglb.py:342-422``);
    ``lax.while_loop`` + stop_gradient on the result. ``K`` is either the
    dense [N, N] matrix or a matvec callable (matrix-free mode)."""
    mv = K if callable(K) else (lambda p: p @ K)

    class CGState(NamedTuple):
        i: jax.Array
        v: jax.Array
        r: jax.Array
        p: jax.Array
        rz: jax.Array

    def stopping_criterion(state: CGState) -> jax.Array:
        # run until EVERY column's residual quadratic is below tolerance
        return jnp.logical_and(
            0.5 * jnp.max(state.rz) > cg_tolerance, state.i < max_steps
        )

    def cg_step(state: CGState) -> CGState:
        Ap = mv(state.p)
        denom = jnp.sum(state.p * Ap, axis=-1)  # [R]
        # per-column step size [R, 1] (a scalar-broadcast gamma against the
        # trailing N axis is shape-wrong for R > 1 — multi-output fix over
        # the reference); converged columns (p ~ 0, denom ~ 0) take a zero
        # step instead of 0/0
        gamma = jnp.where(denom > 0, state.rz / denom, 0.0)[..., None]
        v = state.v + gamma * state.p
        i = state.i + 1
        restart = state.i % restart_cg_step == restart_cg_step - 1
        r = jax.lax.cond(
            restart,
            lambda: b - mv(v),
            lambda: state.r - gamma * Ap,
        )
        z, new_rz = preconditioner(r)
        beta = jnp.where(state.rz > 0, new_rz / state.rz, 0.0)[..., None]  # [R, 1]
        p = jax.lax.cond(
            restart,
            lambda: z,
            lambda: z + state.p * beta,
        )
        return CGState(i, v, r, p, new_rz)

    Kv = mv(initial)
    r = b - Kv
    z, rz = preconditioner(r)
    p = z
    i = jnp.asarray(0, jnp.int32)
    initial_state = CGState(i, initial, r, p, rz)
    final_state = jax.lax.while_loop(stopping_criterion, cg_step, initial_state)
    return jax.lax.stop_gradient(final_state.v)
