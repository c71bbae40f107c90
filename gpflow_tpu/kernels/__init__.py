"""Kernel zoo (reference ``/root/reference/gpflow/kernels/__init__.py``).

Broadcasting convention over leading batch dimensions
(reference ``kernels/__init__.py:9-15``):
  K(X: [batch..., N, D], X2: [batch2..., M, D]) -> [batch..., N, batch2..., M]
  K_diag(X: [batch..., N, D]) -> [batch..., N]
"""
from .base import ActiveDims, Combination, Kernel, Product, ReducingCombination, Sum
from .categorical import Categorical
from .changepoints import ChangePoints
from .convolutional import Convolutional
from .linears import Linear, Polynomial
from .misc import ArcCosine, Coregion
from .multioutput import (
    IndependentLatent,
    LinearCoregionalization,
    MultioutputKernel,
    SeparateIndependent,
    SharedIndependent,
)
from .periodic import Periodic
from .statics import Bias, Constant, Static, White
from .stationaries import (
    AnisotropicStationary,
    Cosine,
    Exponential,
    IsotropicStationary,
    Matern12,
    Matern32,
    Matern52,
    RationalQuadratic,
    SquaredExponential,
    Stationary,
)

#: Alias (reference ``kernels/__init__.py``)
RBF = SquaredExponential

__all__ = [
    "ActiveDims",
    "AnisotropicStationary",
    "ArcCosine",
    "Bias",
    "Categorical",
    "ChangePoints",
    "Combination",
    "Constant",
    "Convolutional",
    "Coregion",
    "Cosine",
    "Exponential",
    "IndependentLatent",
    "IsotropicStationary",
    "Kernel",
    "Linear",
    "LinearCoregionalization",
    "Matern12",
    "Matern32",
    "Matern52",
    "MultioutputKernel",
    "Periodic",
    "Polynomial",
    "Product",
    "RBF",
    "RationalQuadratic",
    "ReducingCombination",
    "SeparateIndependent",
    "SharedIndependent",
    "SquaredExponential",
    "Static",
    "Stationary",
    "Sum",
    "White",
]
