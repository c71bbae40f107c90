"""Misc likelihoods (reference ``/root/reference/gpflow/likelihoods/misc.py``)."""
from __future__ import annotations

from .base import MonteCarloLikelihood
from ..utilities.shapes import inherit_check_shapes
from .scalar_continuous import Gaussian

__all__ = ["GaussianMC"]


class GaussianMC(MonteCarloLikelihood, Gaussian):
    """Stochastic (Monte-Carlo) Gaussian likelihood, for demonstration
    (reference ``misc.py:19-24``)."""
