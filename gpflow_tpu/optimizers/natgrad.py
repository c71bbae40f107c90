"""Natural-gradient optimizer for (q_mu, q_sqrt) variational parameters
(Salimbeni et al. 2018, eq. 10; reference
``/root/reference/gpflow/optimizers/natgrad.py``).

The reference's nested forward/backward GradientTape construction maps cleanly
onto JAX primitives (SURVEY.md §7.3.4):
  * dL/deta (expectation params) = vjp of expectation_to_meanvarsqrt,
  * (dxi/dtheta) dL/deta = jvp of naturals_to_xi (the double-vjp trick).
The whole step (loss grad + conversions + assign) is one jit-compiled pure
function per parameter group.
"""
from __future__ import annotations

import abc
import functools
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from ..base import Parameter, capture_parameter_reads, functionalize
from ..utilities.shapes import check_shapes, inherit_check_shapes

import numpy as _np

# import-level parity with reference ``natgrad.py:25``
Scalar = Union[float, jax.Array, _np.ndarray]

__all__ = [
    "NaturalGradient",
    "XiNat",
    "XiSqrtMeanVar",
    "XiTransform",
    "expectation_to_meanvarsqrt",
    "expectation_to_natural",
    "meanvarsqrt_to_expectation",
    "meanvarsqrt_to_natural",
    "natural_to_expectation",
    "natural_to_meanvarsqrt",
]

LossClosure = Callable[[], jax.Array]


class XiTransform(metaclass=abc.ABCMeta):
    """Transformations for natural-gradient steps in an arbitrary xi
    parameterization (reference ``natgrad.py:43-98``)."""

    @staticmethod
    @abc.abstractmethod
    @check_shapes(
        "mean: [N, D]",
        "varsqrt: [D, N, N]",
        "return[0]: [N, D]",
        "return[1]: [D, N, N]",
    )
    def meanvarsqrt_to_xi(mean: jax.Array, varsqrt: jax.Array) -> Tuple[jax.Array, jax.Array]:
        ...

    @staticmethod
    @abc.abstractmethod
    @check_shapes(
        "xi1: [N, D]",
        "xi2: [D, N, N]",
        "return[0]: [N, D]",
        "return[1]: [D, N, N]",
    )
    def xi_to_meanvarsqrt(xi1: jax.Array, xi2: jax.Array) -> Tuple[jax.Array, jax.Array]:
        ...

    @staticmethod
    @abc.abstractmethod
    @check_shapes(
        "nat1: [N, D]",
        "nat2: [D, N, N]",
        "return[0]: [N, D]",
        "return[1]: [D, N, N]",
    )
    def naturals_to_xi(nat1: jax.Array, nat2: jax.Array) -> Tuple[jax.Array, jax.Array]:
        ...


class XiNat(XiTransform):
    """Default transform: xi = natural parameters. Gives the analytic optimum
    in one gamma=1 step for Gaussian likelihoods (reference ``natgrad.py:101-137``)."""

    @staticmethod
    @check_shapes(
        "mean: [N, D]",
        "varsqrt: [D, N, N]",
        "return[0]: [N, D]",
        "return[1]: [D, N, N]",
    )
    def meanvarsqrt_to_xi(mean: jax.Array, varsqrt: jax.Array) -> Tuple[jax.Array, jax.Array]:
        return meanvarsqrt_to_natural(mean, varsqrt)

    @staticmethod
    @check_shapes(
        "xi1: [N, D]",
        "xi2: [D, N, N]",
        "return[0]: [N, D]",
        "return[1]: [D, N, N]",
    )
    def xi_to_meanvarsqrt(xi1: jax.Array, xi2: jax.Array) -> Tuple[jax.Array, jax.Array]:
        return natural_to_meanvarsqrt(xi1, xi2)

    @staticmethod
    @check_shapes(
        "nat1: [N, D]",
        "nat2: [D, N, N]",
        "return[0]: [N, D]",
        "return[1]: [D, N, N]",
    )
    def naturals_to_xi(nat1: jax.Array, nat2: jax.Array) -> Tuple[jax.Array, jax.Array]:
        return nat1, nat2


class XiSqrtMeanVar(XiTransform):
    """xi = (mean, varsqrt) — natgrad directly on the model parameters
    (reference ``natgrad.py:140-173``)."""

    @staticmethod
    @check_shapes(
        "mean: [N, D]",
        "varsqrt: [D, N, N]",
        "return[0]: [N, D]",
        "return[1]: [D, N, N]",
    )
    def meanvarsqrt_to_xi(mean: jax.Array, varsqrt: jax.Array) -> Tuple[jax.Array, jax.Array]:
        return mean, varsqrt

    @staticmethod
    @check_shapes(
        "xi1: [N, D]",
        "xi2: [D, N, N]",
        "return[0]: [N, D]",
        "return[1]: [D, N, N]",
    )
    def xi_to_meanvarsqrt(xi1: jax.Array, xi2: jax.Array) -> Tuple[jax.Array, jax.Array]:
        return xi1, xi2

    @staticmethod
    @check_shapes(
        "nat1: [N, D]",
        "nat2: [D, N, N]",
        "return[0]: [N, D]",
        "return[1]: [D, N, N]",
    )
    def naturals_to_xi(nat1: jax.Array, nat2: jax.Array) -> Tuple[jax.Array, jax.Array]:
        return natural_to_meanvarsqrt(nat1, nat2)


NatGradParameters = Union[
    Tuple[Parameter, Parameter], Tuple[Parameter, Parameter, XiTransform]
]


class NaturalGradient:
    """Natural gradient descent on q(u) = N(q_mu, q_sqrt q_sqrt^T)
    (reference ``natgrad.py:176-372``). Only the full-covariance
    parametrization is supported (q_diag=True is NOT supported).

    Standalone object (the reference's Keras-optimizer base is dropped per
    SURVEY.md A.5.5); the only public method is ``minimize``.
    """

    def __init__(
        self, gamma: float, xi_transform: Optional[XiTransform] = None, compile: bool = True
    ) -> None:
        self.gamma = gamma
        self.xi_transform = xi_transform if xi_transform is not None else XiNat()
        self.compile = compile
        self._compiled_steps: dict = {}

    def get_config(self) -> Dict[str, Any]:
        """Serialization config (reference ``natgrad.py:369-372``; there it is
        the keras-optimizer hook — here a plain dict for checkpoint metadata)."""
        return {"name": type(self).__name__, "gamma": float(self.gamma)}

    @check_shapes(
        "var_list[all][0]: [N, D]",
        "var_list[all][1]: [D, N, N]",
    )
    def minimize(self, loss_fn: LossClosure, var_list: Sequence[NatGradParameters]) -> None:
        """Performs one natural-gradient step on each (q_mu, q_sqrt[, xi])
        tuple in ``var_list`` (reference ``natgrad.py:184-238``).

        With ``compile=True`` (default) the entire step — loss gradient,
        parameter conversions, and the new unconstrained values — is one
        jit-compiled pure function, cached per (loss_fn, parameter set).
        """
        parameters = [(v[0], v[1], (v[2] if len(v) > 2 else None)) for v in var_list]
        if self.compile:
            # Semantics of the compiled path: the XLA executable is compiled
            # once per (loss_fn, parameter set), but every call re-reads the
            # CURRENT values of all Parameters the closure touches and
            # re-draws any minibatch (one cheap re-trace per call) — the
            # alternating natgrad/Adam loop and iterator-backed losses are
            # both exact. The first call traces twice (discovery + compile).
            self._compiled_step(loss_fn, parameters)
        else:
            self._natgrad_steps(loss_fn, parameters)

    def _compiled_step(
        self,
        loss_fn: LossClosure,
        parameters: Sequence[Tuple[Parameter, Parameter, Optional[XiTransform]]],
    ) -> None:
        q_mus, q_sqrts, xis = zip(*parameters)
        variables = [p for pair in zip(q_mus, q_sqrts) for p in pair]
        for _, q_sqrt, _xi in parameters:
            if q_sqrt.value.ndim != 3:
                raise ValueError(
                    "NaturalGradient only supports the full-covariance parametrization "
                    "q_sqrt: [L, M, M] (q_diag=True is not supported)."
                )

        # Staleness-safe compile caching. Everything the loss closure
        # CAPTURES (hyperparameters, a minibatch, a batch drawn from an
        # iterator at trace time) would be baked into the jitted step as
        # compile-time constants, so a cached step would silently keep
        # optimizing against the values from its first trace while Adam
        # moves the hyperparameters. Two mechanisms make the cached step
        # track reality:
        #   1. Parameter reads are DISCOVERED on the first call
        #      (capture_parameter_reads) and those parameters' current
        #      unconstrained values are passed as traced ARGUMENTS.
        #   2. Remaining array constants (e.g. minibatch data, incl. a
        #      fresh iterator draw) are hoisted per call by re-tracing the
        #      loss (cheap — no XLA compile) and feeding the fresh jaxpr
        #      consts to the cached executable.
        from jax.core import eval_jaxpr

        current = tuple(jnp.asarray(v._unconstrained) for v in variables)

        # Key on the closure by EQUALITY (bound methods compare equal across
        # attribute accesses — identity would miss on every call and pay a
        # discovery trace + XLA compile per step, round-2 review); fall back
        # to identity for unhashable closures.
        try:
            key: Tuple[Any, ...] = (loss_fn, tuple(id(v) for v in variables),
                                    tuple(type(x) for x in xis))
            entry = self._compiled_steps.get(key)
        except TypeError:
            key = (id(loss_fn), tuple(id(v) for v in variables),
                   tuple(type(x) for x in xis))
            entry = self._compiled_steps.get(key)
            if entry is not None and entry[0] is not loss_fn:
                entry = None
        if entry is None:
            plain_loss = functionalize(loss_fn, variables)

            # discovery trace: which OTHER Parameters does the closure read?
            with capture_parameter_reads() as cap:
                jax.make_jaxpr(plain_loss)(current)
            var_ids = {id(v) for v in variables}
            others = tuple(p for p in cap.parameters if id(p) not in var_ids)

            _ext = functionalize(loss_fn, tuple(variables) + others)

            def loss_ext(
                unc: Tuple[jax.Array, ...], other_unc: Tuple[jax.Array, ...]
            ) -> jax.Array:
                return _ext(tuple(unc) + tuple(other_unc))

            other_vals0 = tuple(jnp.asarray(o._unconstrained) for o in others)
            closed0 = jax.make_jaxpr(loss_ext)(current, other_vals0)
            jaxpr0 = closed0.jaxpr

            xi_transforms = [x if x is not None else self.xi_transform for x in xis]
            transforms = [v.transform for v in variables]

            def _step(
                unconstrained: Tuple[jax.Array, ...],
                other_unc: Tuple[jax.Array, ...],
                consts: Tuple[jax.Array, ...],
                gamma: jax.Array,
            ) -> Tuple[jax.Array, ...]:
                # gamma is a traced ARGUMENT: reading self.gamma here would
                # bake the first-trace value into the executable and silently
                # ignore later annealing (round-2 review)
                def loss_c(unc: Tuple[jax.Array, ...]) -> jax.Array:
                    flat = jax.tree_util.tree_leaves((unc, other_unc))
                    return eval_jaxpr(jaxpr0, consts, *flat)[0]

                grads = jax.grad(loss_c)(unconstrained)
                new_unc = []
                for i, xi_transform in enumerate(xi_transforms):
                    mu_t, sq_t = transforms[2 * i], transforms[2 * i + 1]
                    q_mu_value = mu_t.forward(unconstrained[2 * i])
                    q_sqrt_value = sq_t.forward(unconstrained[2 * i + 1])
                    mean_new, varsqrt_new = self._natgrad_values(
                        grads[2 * i], grads[2 * i + 1],
                        q_mu_value, q_sqrt_value, mu_t, sq_t, xi_transform,
                        gamma=gamma,
                    )
                    new_unc.append(mu_t.inverse(mean_new))
                    new_unc.append(sq_t.inverse(varsqrt_new))
                return tuple(new_unc)

            step = jax.jit(_step)
            if len(self._compiled_steps) >= 16:  # bound growth for per-call closures
                self._compiled_steps.pop(next(iter(self._compiled_steps)))
            entry = (loss_fn, step, others, loss_ext)
            self._compiled_steps[key] = entry
            other_vals = other_vals0
            closed = closed0  # first call: reuse the structure trace
        else:
            _, step, others, loss_ext = entry
            other_vals = tuple(jnp.asarray(o._unconstrained) for o in others)
            # per-call re-trace for fresh data consts (one iterator draw per
            # step); the fresh lambda defeats make_jaxpr's trace cache
            closed = jax.make_jaxpr(lambda a, b: loss_ext(a, b))(current, other_vals)
        gamma_now = jnp.asarray(self.gamma, dtype=current[0].dtype)
        new_values = step(current, other_vals, tuple(closed.consts), gamma_now)
        for v, nv in zip(variables, new_values):
            v._unconstrained = nv

    @check_shapes(
        "parameters[all][0]: [N, D]",
        "parameters[all][1]: [D, N, N]",
    )
    def _natgrad_steps(
        self,
        loss_fn: LossClosure,
        parameters: Sequence[Tuple[Parameter, Parameter, Optional[XiTransform]]],
    ) -> None:
        q_mus, q_sqrts, xis = zip(*parameters)
        variables = [p for pair in zip(q_mus, q_sqrts) for p in pair]

        current = tuple(v._unconstrained for v in variables)
        grads = jax.grad(functionalize(loss_fn, variables))(current)

        for i, (q_mu, q_sqrt, xi_transform) in enumerate(parameters):
            q_mu_grad, q_sqrt_grad = grads[2 * i], grads[2 * i + 1]
            self._natgrad_apply_gradients(q_mu_grad, q_sqrt_grad, q_mu, q_sqrt, xi_transform)

    def _natgrad_values(
        self,
        q_mu_grad: jax.Array,
        q_sqrt_grad: jax.Array,
        q_mu_value: jax.Array,
        q_sqrt_value: jax.Array,
        mu_transform,
        sqrt_transform,
        xi_transform: XiTransform,
        gamma=None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Pure-functional core of the backward natgrad step; see
        ``_natgrad_values_with_ok`` for the step-acceptance flag."""
        mean_new, varsqrt_new, _ = self._natgrad_values_with_ok(
            q_mu_grad, q_sqrt_grad, q_mu_value, q_sqrt_value,
            mu_transform, sqrt_transform, xi_transform, gamma=gamma,
        )
        return mean_new, varsqrt_new

    def _natgrad_values_with_ok(
        self,
        q_mu_grad: jax.Array,
        q_sqrt_grad: jax.Array,
        q_mu_value: jax.Array,
        q_sqrt_value: jax.Array,
        mu_transform,
        sqrt_transform,
        xi_transform: XiTransform,
        gamma=None,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """As ``_natgrad_values`` but also returns the boolean acceptance
        flag (False = the step left the negative-definite cone and was
        rejected, state unchanged). ``gamma`` overrides ``self.gamma`` so
        compiled callers can pass it as a traced argument (annealing must
        not be baked into the executable)."""
        gamma = self.gamma if gamma is None else gamma
        dL_dmean = mu_transform.forward(q_mu_grad)
        dL_dvarsqrt = sqrt_transform.forward(q_sqrt_grad)

        eta1, eta2 = meanvarsqrt_to_expectation(q_mu_value, q_sqrt_value)
        _, vjp_fn = jax.vjp(lambda e1, e2: expectation_to_meanvarsqrt(e1, e2), eta1, eta2)
        dL_deta1, dL_deta2 = vjp_fn((dL_dmean, dL_dvarsqrt))

        if not isinstance(xi_transform, XiNat):
            nat1, nat2 = meanvarsqrt_to_natural(q_mu_value, q_sqrt_value)
            _, (nat_dL_xi1, nat_dL_xi2) = jax.jvp(
                lambda n1, n2: xi_transform.naturals_to_xi(n1, n2),
                (nat1, nat2),
                (dL_deta1, dL_deta2),
            )
        else:
            nat_dL_xi1, nat_dL_xi2 = dL_deta1, dL_deta2

        xi1, xi2 = xi_transform.meanvarsqrt_to_xi(q_mu_value, q_sqrt_value)
        xi1_new = xi1 - gamma * nat_dL_xi1
        xi2_new = xi2 - gamma * nat_dL_xi2
        mean_new, varsqrt_new = xi_transform.xi_to_meanvarsqrt(xi1_new, xi2_new)
        # Step rejection: a stochastic natural-gradient step can push nat2 out
        # of the negative-definite cone (especially while another optimizer is
        # simultaneously moving the hyperparameters), making the conversion's
        # Cholesky — and then the entire training state — NaN. The reference
        # crashes there; instead keep (q_mu, q_sqrt) unchanged for this step
        # and let the next minibatch retry. Branch-free, so it stays one fused
        # XLA program under jit/scan.
        ok = jnp.isfinite(mean_new).all() & jnp.isfinite(varsqrt_new).all()
        mean_new = jnp.where(ok, mean_new, q_mu_value)
        varsqrt_new = jnp.where(ok, varsqrt_new, q_sqrt_value)
        return mean_new, varsqrt_new, ok

    @check_shapes(
        "q_mu_grad: [N, D]",
        "q_sqrt_grad: [D, N_N_transformed...]",
        "q_mu: [N, D]",
        "q_sqrt: [D, N, N]",
    )
    def _natgrad_apply_gradients(
        self,
        q_mu_grad: jax.Array,
        q_sqrt_grad: jax.Array,
        q_mu: Parameter,
        q_sqrt: Parameter,
        xi_transform: Optional[XiTransform] = None,
    ) -> None:
        """Backward natgrad step, implementing Salimbeni'18 eq. 10
        (reference ``natgrad.py:280-367``); see module docstring for the
        JAX mapping of the tape construction."""
        if xi_transform is None:
            xi_transform = self.xi_transform

        if q_sqrt.value.ndim != 3:
            raise ValueError(
                "NaturalGradient only supports the full-covariance parametrization "
                "q_sqrt: [L, M, M]; the diagonal q_diag=True parametrization is not "
                "supported (same restriction as the reference implementation)."
            )

        mean_new, varsqrt_new = self._natgrad_values(
            q_mu_grad, q_sqrt_grad, q_mu.value, q_sqrt.value,
            q_mu.transform, q_sqrt.transform, xi_transform,
        )
        q_mu.assign(mean_new)
        q_sqrt.assign(varsqrt_new)


# ---------------------------------------------------------------------------
# Gaussian parameter conversions (reference ``natgrad.py:382-516``). The raw
# functions broadcast over the leading [D] dim with inputs [D, N, 1]/[D, N, N];
# the swap_dimensions wrapper adapts to GPflow's [N, D] layout.
# ---------------------------------------------------------------------------


def swap_dimensions(
    method: Callable[[jax.Array, jax.Array], Tuple[jax.Array, jax.Array]]
) -> Callable[..., Tuple[jax.Array, jax.Array]]:
    @functools.wraps(method)
    @check_shapes(
        "a_nd: [N, D] if swap",
        "a_nd: [D, N, 1] if not swap",
        "b_dnn: [D, N, N]",
        "return[0]: [N, D] if swap",
        "return[0]: [D, N, 1] if not swap",
        "return[1]: [D, N, N]",
    )
    def wrapper(a_nd: jax.Array, b_dnn: jax.Array, swap: bool = True) -> Tuple[jax.Array, jax.Array]:
        if swap:
            a_dn1 = jnp.swapaxes(jnp.asarray(a_nd), -1, -2)[:, :, None]
            A_dn1, B_dnn = method(a_dn1, jnp.asarray(b_dnn))
            A_nd = jnp.swapaxes(A_dn1[:, :, 0], -1, -2)
            return A_nd, B_dnn
        return method(jnp.asarray(a_nd), jnp.asarray(b_dnn))

    return wrapper


@check_shapes(
    "M: [D, N, N]",
    "return: [D, N, N]",
)
def _inverse_lower_triangular(M: jax.Array) -> jax.Array:
    """Batched inverse of lower-triangular matrices [D, N, N]
    (reference ``natgrad.py:500-516``)."""
    N = M.shape[-1]
    I_dnn = jnp.broadcast_to(jnp.eye(N, dtype=M.dtype), M.shape)
    return solve_triangular(M, I_dnn, lower=True)


def _mm(a: jax.Array, b: jax.Array) -> jax.Array:
    """Full-precision matmul for the conversion algebra: these [M, M]
    products feed Cholesky factorizations, where fast (bf16-input) matmul
    rounding makes the results indefinite in f32 (cancellation in
    eta2 - mu mu^T and S^-1 constructions). Cost is negligible next to the
    [M, B] data terms."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


from ..ops.linalg import sym_jitter as _sym_jitter  # noqa: E402 - shared helper


@swap_dimensions
@check_shapes(
    "nat1: [D, N, 1]",
    "nat2: [D, N, N]",
    "return[0]: [D, N, 1]",
    "return[1]: [D, N, N]",
)
def natural_to_meanvarsqrt(nat1: jax.Array, nat2: jax.Array) -> Tuple[jax.Array, jax.Array]:
    var_sqrt_inv = jnp.linalg.cholesky(_sym_jitter(-2 * nat2))
    var_sqrt = _inverse_lower_triangular(var_sqrt_inv)
    S = _mm(jnp.swapaxes(var_sqrt, -1, -2), var_sqrt)
    mu = _mm(S, nat1)
    # need S = L L^T, not L^T L => another cholesky
    return mu, jnp.linalg.cholesky(_sym_jitter(S))


@swap_dimensions
@check_shapes(
    "mu: [D, N, 1]",
    "s_sqrt: [D, N, N]",
    "return[0]: [D, N, 1]",
    "return[1]: [D, N, N]",
)
def meanvarsqrt_to_natural(mu: jax.Array, s_sqrt: jax.Array) -> Tuple[jax.Array, jax.Array]:
    s_sqrt_inv = _inverse_lower_triangular(s_sqrt)
    s_inv = _mm(jnp.swapaxes(s_sqrt_inv, -1, -2), s_sqrt_inv)
    return _mm(s_inv, mu), -0.5 * s_inv


@swap_dimensions
@check_shapes(
    "nat1: [D, N, 1]",
    "nat2: [D, N, N]",
    "return[0]: [D, N, 1]",
    "return[1]: [D, N, N]",
)
def natural_to_expectation(nat1: jax.Array, nat2: jax.Array) -> Tuple[jax.Array, jax.Array]:
    return meanvarsqrt_to_expectation(
        *natural_to_meanvarsqrt(nat1, nat2, swap=False), swap=False
    )


@swap_dimensions
@check_shapes(
    "eta1: [D, N, 1]",
    "eta2: [D, N, N]",
    "return[0]: [D, N, 1]",
    "return[1]: [D, N, N]",
)
def expectation_to_natural(eta1: jax.Array, eta2: jax.Array) -> Tuple[jax.Array, jax.Array]:
    return meanvarsqrt_to_natural(
        *expectation_to_meanvarsqrt(eta1, eta2, swap=False), swap=False
    )


@swap_dimensions
@check_shapes(
    "eta1: [D, N, 1]",
    "eta2: [D, N, N]",
    "return[0]: [D, N, 1]",
    "return[1]: [D, N, N]",
)
def expectation_to_meanvarsqrt(eta1: jax.Array, eta2: jax.Array) -> Tuple[jax.Array, jax.Array]:
    var = eta2 - _mm(eta1, jnp.swapaxes(eta1, -1, -2))
    return eta1, jnp.linalg.cholesky(_sym_jitter(var))


@swap_dimensions
@check_shapes(
    "m: [D, N, 1]",
    "v_sqrt: [D, N, N]",
    "return[0]: [D, N, 1]",
    "return[1]: [D, N, N]",
)
def meanvarsqrt_to_expectation(m: jax.Array, v_sqrt: jax.Array) -> Tuple[jax.Array, jax.Array]:
    v = _mm(v_sqrt, jnp.swapaxes(v_sqrt, -1, -2))
    return m, v + _mm(m, jnp.swapaxes(m, -1, -2))
