"""Tiny distribution containers for the expectations framework (reference
``/root/reference/gpflow/probability_distributions.py:52-105``)."""
from __future__ import annotations

from typing import Optional, Tuple

import jax

from .base import Module, TensorType
from .utilities.shapes import check_shapes

__all__ = [
    "DiagonalGaussian",
    "Gaussian",
    "MarkovGaussian",
    "ProbabilityDistribution",
    "get_probability_distribution_shape",
]


class ProbabilityDistribution(Module):
    """Base container for an input distribution over X.

    Subclasses expose ``.shape`` ([N, D]-style, reference
    ``probability_distributions.py:32-42``), consumed by the shape-contract
    system via :func:`get_probability_distribution_shape`.
    """

    @property
    def shape(self) -> Optional[Tuple[int, ...]]:
        """[N, D]-style shape of the distribution (reference
        ``probability_distributions.py:32-42``); N = data points, D = input
        dims. Concrete subclasses derive it from ``mu``."""
        raise NotImplementedError(
            f"{type(self).__name__} must implement the `shape` property"
        )


class Gaussian(ProbabilityDistribution):
    """mu: [N, D], cov: [N, D, D]."""

    @check_shapes(
        "mu: [N, D]",
        "cov: [N, D, D]",
    )
    def __init__(self, mu: TensorType, cov: TensorType) -> None:
        self.mu = mu
        self.cov = cov

    @property
    def shape(self) -> Optional[Tuple[int, ...]]:
        return self.mu.shape


class DiagonalGaussian(ProbabilityDistribution):
    """mu: [N, D], cov diagonal: [N, D]."""

    @check_shapes(
        "mu: [N, D]",
        "cov: [N, D]",
    )
    def __init__(self, mu: TensorType, cov: TensorType) -> None:
        self.mu = mu
        self.cov = cov

    @property
    def shape(self) -> Optional[Tuple[int, ...]]:
        return self.mu.shape


from .utilities.shapes import register_get_shape  # noqa: E402


@register_get_shape(ProbabilityDistribution)
def get_probability_distribution_shape(shaped: ProbabilityDistribution):
    """Shape extractor for the shape-contract system (reference
    ``probability_distributions.py:45-49``)."""
    return tuple(shaped.shape)


class MarkovGaussian(ProbabilityDistribution):
    """Gaussian with temporal structure for time-series models
    (reference ``probability_distributions.py:83-105``):
    mu: [N+1, D]; cov: [2, N+1, D, D] — cov[0] marginal covs, cov[1]
    cross-covs between consecutive timesteps.
    """

    @check_shapes(
        "mu: [N_plus_1, D]",
        "cov: [2, N_plus_1, D, D]",
    )
    def __init__(self, mu: TensorType, cov: TensorType) -> None:
        self.mu = mu
        self.cov = cov

    @property
    def shape(self) -> Optional[Tuple[int, ...]]:
        # (N, D), NOT mu's (N+1, D) — matches the reference's contract shape
        # (``probability_distributions.py:98-105``) so shared specs bind N
        # consistently across Markov and plain Gaussians
        shape = self.mu.shape
        if not shape:
            return None
        n_plus_1, d = shape
        return (n_plus_1 - 1, d)
