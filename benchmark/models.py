"""Model factories for the benchmark grid (reference
``benchmark/models.py:50-84``): GPR/VGP for non-LARGE datasets, SGPR/SVGP for
all; RBF kernels, inducing points initialized from the data."""
from __future__ import annotations

from typing import Any, Callable, Tuple

import numpy as np

from .registry import Registry

__all__ = ["MODELS", "create_model"]

MODELS: Registry = Registry("model")


def _kernel(D: int):
    import gpflow_tpu

    return gpflow_tpu.kernels.SquaredExponential(lengthscales=np.ones(D))


def _inducing(X: np.ndarray, m: int = 100) -> np.ndarray:
    idx = np.random.RandomState(0).permutation(len(X))[: min(m, len(X))]
    return X[idx].copy()


def _is_classification(Y: np.ndarray) -> bool:
    return set(np.unique(Y)) <= {0.0, 1.0}


def _gpr(data: Tuple[np.ndarray, np.ndarray]):
    import gpflow_tpu

    X, Y = data
    return gpflow_tpu.models.GPR(data, kernel=_kernel(X.shape[1]))


def _vgp(data: Tuple[np.ndarray, np.ndarray]):
    import gpflow_tpu

    X, Y = data
    lik = (
        gpflow_tpu.likelihoods.Bernoulli()
        if _is_classification(Y)
        else gpflow_tpu.likelihoods.Gaussian()
    )
    return gpflow_tpu.models.VGP(data, kernel=_kernel(X.shape[1]), likelihood=lik)


def _sgpr(data: Tuple[np.ndarray, np.ndarray]):
    import gpflow_tpu

    X, Y = data
    return gpflow_tpu.models.SGPR(
        data, kernel=_kernel(X.shape[1]), inducing_variable=_inducing(X)
    )


def _svgp(data: Tuple[np.ndarray, np.ndarray]):
    import gpflow_tpu

    X, Y = data
    lik = (
        gpflow_tpu.likelihoods.Bernoulli()
        if _is_classification(Y)
        else gpflow_tpu.likelihoods.Gaussian()
    )
    return gpflow_tpu.models.SVGP(
        kernel=_kernel(X.shape[1]),
        likelihood=lik,
        inducing_variable=_inducing(X),
        num_data=len(X),
    )


def _num_classes(Y: np.ndarray) -> int:
    return int(Y.max()) + 1


def _svgp_multiclass(data: Tuple[np.ndarray, np.ndarray]):
    """SVGP + MultiClass(RobustMax): C latent GPs, analytic GH var-exp
    (reference likelihood: gpflow/likelihoods/multiclass.py RobustMax)."""
    import gpflow_tpu

    X, Y = data
    C = _num_classes(Y)
    return gpflow_tpu.models.SVGP(
        kernel=_kernel(X.shape[1]),
        likelihood=gpflow_tpu.likelihoods.MultiClass(C),
        inducing_variable=_inducing(X),
        num_latent_gps=C,
        num_data=len(X),
    )


def _svgp_softmax(data: Tuple[np.ndarray, np.ndarray]):
    """SVGP + Softmax (Monte-Carlo variational expectations), C latent GPs."""
    import gpflow_tpu

    X, Y = data
    C = _num_classes(Y)
    return gpflow_tpu.models.SVGP(
        kernel=_kernel(X.shape[1]),
        likelihood=gpflow_tpu.likelihoods.Softmax(C),
        inducing_variable=_inducing(X),
        num_latent_gps=C,
        num_data=len(X),
    )


MODELS.register("gpr", _gpr, tags=["regression", "non_large"])
MODELS.register("vgp", _vgp, tags=["regression", "classification", "non_large"])
MODELS.register("sgpr", _sgpr, tags=["regression", "all_sizes"])
MODELS.register("svgp", _svgp, tags=["regression", "classification", "all_sizes"])
MODELS.register("svgp_multiclass", _svgp_multiclass, tags=["multiclass", "all_sizes"])
MODELS.register("svgp_softmax", _svgp_softmax, tags=["multiclass", "all_sizes", "mc"])


def create_model(name: str, data: Tuple[np.ndarray, np.ndarray]):
    return MODELS.get(name)(data)
