"""Gauss-Hermite quadrature fallbacks for expectations (reference
``/root/reference/gpflow/expectations/quadratures.py``)."""
from __future__ import annotations

from typing import Any, Callable, Optional, Type, Union

import jax
import jax.numpy as jnp
import numpy as np

from .. import kernels
from .. import functions as mfn
from ..covariances import Kuf
from ..inducing_variables import InducingVariables
from ..probability_distributions import DiagonalGaussian, Gaussian, MarkovGaussian
from ..quadrature import mvnquad
from ..utilities.shapes import check_shapes
from . import dispatch
from .expectations import quadrature_expectation

NoneType: Type[None] = type(None)

# import-level parity with reference ``quadratures.py:31-35``
register = dispatch.quadrature_expectation.register
EllipsisType = Any  # the reference's own placeholder for `...` slices


def get_eval_func(
    obj: object,
    inducing_variable: Optional[InducingVariables],
    slice_: object = None,
) -> Callable[[jax.Array], jax.Array]:
    """Returns the function of interest (kernel or mean) for the expectation
    (reference ``quadratures.py:39-62``)."""
    slice_ = ... if slice_ is None else slice_
    if inducing_variable is not None:
        if not isinstance(inducing_variable, InducingVariables) or not isinstance(
            obj, kernels.Kernel
        ):
            raise TypeError("If `inducing_variable` is supplied, `obj` must be a kernel.")
        return lambda x: jnp.transpose(Kuf(inducing_variable, obj, x))[slice_]
    elif isinstance(obj, mfn.MeanFunction):
        return lambda x: obj(x)[slice_]
    elif isinstance(obj, kernels.Kernel):
        return lambda x: obj(x, full_cov=False)
    raise NotImplementedError()


@dispatch.quadrature_expectation.register(
    (Gaussian, DiagonalGaussian),
    object,
    (InducingVariables, NoneType),
    object,
    (InducingVariables, NoneType),
)
@check_shapes("p: [N, D]", "inducing_variable1: [M1, D, P]", "inducing_variable2: [M2, D, P]", "return: [N, ...]")
def _quadrature_expectation_gaussian(
    p, obj1, inducing_variable1, obj2, inducing_variable2, nghp=None
):
    """Generic fallback via full-covariance Gauss-Hermite
    (reference ``quadratures.py:65-126``)."""
    nghp = 100 if nghp is None else nghp

    if obj1 is None:
        raise NotImplementedError("First object cannot be None.")

    if not isinstance(p, DiagonalGaussian):
        cov = p.cov
    else:
        if (
            isinstance(obj1, kernels.Kernel)
            and isinstance(obj2, kernels.Kernel)
            and obj1.on_separate_dims(obj2)
        ):
            eKxz1 = quadrature_expectation(p, (obj1, inducing_variable1), nghp=nghp)
            eKxz2 = quadrature_expectation(p, (obj2, inducing_variable2), nghp=nghp)
            return eKxz1[:, :, None] * eKxz2[:, None, :]
        cov = jax.vmap(jnp.diag)(jnp.asarray(p.cov))

    if obj2 is None:

        def eval_func(x):
            return get_eval_func(obj1, inducing_variable1)(x)

    else:

        def eval_func(x):
            fn1 = get_eval_func(obj1, inducing_variable1, np.s_[:, :, None])
            fn2 = get_eval_func(obj2, inducing_variable2, np.s_[:, None, :])
            return fn1(x) * fn2(x)

    return mvnquad(eval_func, jnp.asarray(p.mu), jnp.asarray(cov), nghp)


@dispatch.quadrature_expectation.register(
    MarkovGaussian, object, (InducingVariables, NoneType), object, (InducingVariables, NoneType)
)
@check_shapes("p: [N, D]", "return: [N, ...]")
def _quadrature_expectation_markov(
    p, obj1, inducing_variable1, obj2, inducing_variable2, nghp=None
):
    """Markov-Gaussian fallback (reference ``quadratures.py:129-189``):
    obj1 pairs with x_n, obj2 with x_{n+1}."""
    nghp = 40 if nghp is None else nghp

    if obj2 is None:

        def eval_func(x):
            return get_eval_func(obj1, inducing_variable1)(x)

        mu, cov = p.mu[:-1], p.cov[0, :-1]
    elif obj1 is None:

        def eval_func(x):
            return get_eval_func(obj2, inducing_variable2)(x)

        mu, cov = p.mu[1:], p.cov[0, 1:]
    else:

        def eval_func(x):
            x1, x2 = jnp.split(x, 2, axis=1)
            res1 = get_eval_func(obj1, inducing_variable1, np.s_[:, :, None])(x1)
            res2 = get_eval_func(obj2, inducing_variable2, np.s_[:, None, :])(x2)
            return res1 * res2

        mu = jnp.concatenate((p.mu[:-1, :], p.mu[1:, :]), axis=1)  # [N, 2D]
        cov_top = jnp.concatenate((p.cov[0, :-1], p.cov[1, :-1]), axis=2)
        cov_bottom = jnp.concatenate(
            (jnp.swapaxes(p.cov[1, :-1], -1, -2), p.cov[0, 1:]), axis=2
        )
        cov = jnp.concatenate((cov_top, cov_bottom), axis=1)  # [N, 2D, 2D]

    return mvnquad(eval_func, jnp.asarray(mu), jnp.asarray(cov), nghp)
