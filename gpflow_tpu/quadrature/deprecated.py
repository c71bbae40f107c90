"""Back-compat quadrature helpers (reference
``/root/reference/gpflow/quadrature/deprecated.py``)."""
from __future__ import annotations

from typing import Any, Callable, Iterable, List, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..utilities.shapes import check_shapes
from .gauss_hermite import NDiagGHQuadrature, gh_points_and_weights

__all__ = ["hermgauss", "mvhermgauss", "mvnquad", "ndiag_mc", "ndiagquad"]

_mc_seed = [0]


def _default_mc_epsilon(Fmu: jax.Array, shape: Tuple[int, ...]) -> jax.Array:
    """Default MC noise when the caller passes no ``epsilon``.

    Outside jit: a fresh stateful key per call (matches the reference's
    ``tf.random.normal``). Under tracing, a stateful key would bake ONE
    fixed noise realization into the compiled function — every training
    step would share the same draws and the MC error would become a frozen
    systematic bias. Instead the key is derived in-graph from the
    (gradient-stopped) bits of ``Fmu``: the draws change whenever the
    predictive moments change (i.e. every optimization step), so the MC
    error decorrelates across steps. For reproducible or
    antithetic/custom sampling pass ``epsilon`` explicitly."""
    try:
        tracing = type(jax.core.trace_ctx.trace).__name__ != "EvalTrace"
    except AttributeError:  # jax internals moved: assume eager
        tracing = False
    if tracing:
        bits = jax.lax.stop_gradient(jnp.asarray(Fmu)).astype(jnp.float32)
        seed = jax.lax.bitcast_convert_type(jnp.sum(bits), jnp.uint32)
        key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
    else:
        _mc_seed[0] += 1
        key = jax.random.PRNGKey(_mc_seed[0])
    return jax.random.normal(key, shape, dtype=Fmu.dtype)


@check_shapes(
    "return[0]: [n_quad_points]",
    "return[1]: [n_quad_points]",
)
def hermgauss(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """Gauss-Hermite points/weights in the default float (reference
    ``quadrature/deprecated.py:34-38``)."""
    from ..config import default_float

    x, w = np.polynomial.hermite.hermgauss(n)
    return x.astype(default_float()), w.astype(default_float())


@check_shapes(
    "return[0]: [n_quad_points, D]",
    "return[1]: [n_quad_points]",
)
def mvhermgauss(H: int, D: int) -> Tuple[np.ndarray, np.ndarray]:
    """Multivariate (full-grid) Gauss-Hermite locations [H**D, D] and weights
    [H**D] (reference ``quadrature/deprecated.py:45-60``)."""
    import itertools

    gh_x, gh_w = hermgauss(H)
    x = np.array(list(itertools.product(*(gh_x,) * D)))
    w = np.prod(np.array(list(itertools.product(*(gh_w,) * D))), 1)
    return x, w


@check_shapes(
    "Ys.values(): [N...]",
)
def ndiagquad(
    funcs: Union[Callable[..., jax.Array], Iterable],
    H: int,
    Fmu: Union[jax.Array, Tuple[jax.Array, ...], List[jax.Array]],
    Fvar: Union[jax.Array, Tuple[jax.Array, ...], List[jax.Array]],
    logspace: bool = False,
    **Ys: jax.Array,
) -> Union[jax.Array, List[jax.Array]]:
    """Computes N Gaussian expectation integrals of one or more functions via
    Gauss-Hermite quadrature (reference ``deprecated.py:99-221``).

    ``Fmu``/``Fvar`` may be a [N, 1] array or a Din-tuple thereof; ``funcs``
    take Din positional f-arguments plus the ``Ys`` keyword args.
    """
    if isinstance(Fmu, (tuple, list)):
        dim = len(Fmu)
        shape = jnp.shape(Fmu[0])
        Fmu_stacked = jnp.stack([jnp.asarray(f) for f in Fmu], axis=-1)
        Fvar_stacked = jnp.stack([jnp.asarray(v) for v in Fvar], axis=-1)
    else:
        # no shape juggling needed: the flattening reshape below handles any
        # rank, including 0-d scalars (reference deprecated.py:150-153 does
        # the same single tf.reshape)
        dim = 1
        shape = jnp.shape(Fmu)
        Fmu_stacked = jnp.asarray(Fmu)
        Fvar_stacked = jnp.asarray(Fvar)

    Fmu_flat = Fmu_stacked.reshape(-1, dim)
    Fvar_flat = Fvar_stacked.reshape(-1, dim)
    Ys_flat = {name: jnp.reshape(Y, (-1, 1)) for name, Y in Ys.items()}

    def wrap(fun: Callable[..., jax.Array]) -> Callable[..., jax.Array]:
        def new_fun(X: jax.Array, **ys: jax.Array) -> jax.Array:
            Xs = [X[..., i] for i in range(dim)]
            res = fun(*Xs, **ys) if not ys else fun(*Xs, **{k: v[..., 0] for k, v in ys.items()})
            return res[..., None]

        return new_fun

    quadrature = NDiagGHQuadrature(dim, H)
    if callable(funcs):
        wrapped: Union[Callable[..., jax.Array], List[Callable[..., jax.Array]]] = wrap(funcs)
    else:
        wrapped = [wrap(f) for f in funcs]

    if logspace:
        result = quadrature.logspace(wrapped, Fmu_flat, Fvar_flat, **Ys_flat)
    else:
        result = quadrature(wrapped, Fmu_flat, Fvar_flat, **Ys_flat)

    if isinstance(result, list):
        return [jnp.reshape(r, shape) for r in result]
    return jnp.reshape(result, shape)


@check_shapes(
    "Fmu: [N, Din]",
    "Fvar: [N, Din]",
    "Ys.values(): [broadcast N, .]",
)
def ndiag_mc(
    funcs: Union[Callable[..., jax.Array], Iterable],
    S: int,
    Fmu: jax.Array,
    Fvar: jax.Array,
    logspace: bool = False,
    epsilon: jax.Array = None,
    **Ys: jax.Array,
) -> Union[jax.Array, List[jax.Array]]:
    """Monte-Carlo estimate of Gaussian expectations
    (reference ``deprecated.py:224-277``). ``epsilon`` [S, N, D] standard
    normals; if None, see ``_default_mc_epsilon``."""
    N, D = Fmu.shape[0], Fmu.shape[-1]
    if epsilon is None:
        epsilon = _default_mc_epsilon(Fmu, (S, N, D))
    # clamp as in NDiagGHQuadrature._build_X_W: reduced-precision modes can
    # round the variance slightly negative. Double-where so the clamped
    # branch has a zero (not NaN) gradient at Fvar <= 0.
    positive = Fvar > 0
    safe_var = jnp.where(positive, Fvar, jnp.ones((), Fvar.dtype))
    std = jnp.where(positive, jnp.sqrt(safe_var), jnp.zeros((), Fvar.dtype))
    mc_x = Fmu[None, :, :] + std[None, :, :] * epsilon
    mc_Xr = mc_x.reshape(S * N, D)
    Ys_r = {name: jnp.tile(Y, (S, 1)) for name, Y in Ys.items()}

    def eval_func(func: Callable[..., jax.Array]) -> jax.Array:
        feval = func(mc_Xr, **Ys_r)
        feval = feval.reshape(S, N, -1)
        if logspace:
            log_S = jnp.log(jnp.asarray(S, feval.dtype))
            return jax.scipy.special.logsumexp(feval, axis=0) - log_S
        return jnp.mean(feval, axis=0)

    if callable(funcs):
        return eval_func(funcs)
    return [eval_func(f) for f in funcs]


@check_shapes(
    "means: [N, Din]",
    "covs: [N, Din, Din]",
)
def mvnquad(
    func: Callable[[jax.Array], jax.Array],
    means: jax.Array,
    covs: jax.Array,
    H: int,
    Din: int = None,
    Dout: Tuple[int, ...] = None,
) -> jax.Array:
    """Full-covariance Gauss-Hermite quadrature (reference
    ``deprecated.py:68-96``): rotates the GH grid by the Cholesky of each cov.

    means: [N, Din], covs: [N, Din, Din] -> [N, *Dout].
    """
    if Din is None:
        Din = means.shape[1]
    xn, wn = gh_points_and_weights(H)
    grid = np.array(np.meshgrid(*(xn,) * Din)).reshape(Din, -1).T  # [H**Din, Din]
    wgrid = np.prod(np.array(np.meshgrid(*(wn,) * Din)).reshape(Din, -1).T, axis=1)
    grid = jnp.asarray(grid, means.dtype)
    wgrid = jnp.asarray(wgrid, means.dtype)

    cholXcov = jnp.linalg.cholesky(covs)  # [N, Din, Din]
    # X = mean + L @ z for each quadrature point: [N, H**Din, Din]
    Xall = means[:, None, :] + jnp.einsum("nij,qj->nqi", cholXcov, grid)
    N = means.shape[0]
    Xr = Xall.reshape(-1, Din)
    fevals = func(Xr)
    if Dout is None:
        Dout = fevals.shape[1:]
    fX = fevals.reshape((N, grid.shape[0]) + tuple(Dout))
    wr = wgrid.reshape((1, grid.shape[0]) + (1,) * len(Dout))
    return jnp.sum(fX * wr, axis=1)
