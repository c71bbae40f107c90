"""Analytic kernel expectations / psi statistics (reference
``/root/reference/gpflow/expectations/__init__.py``)."""
from . import (  # noqa: F401 - imported to register dispatch implementations
    cross_kernels,
    linears,
    mean_functions,
    misc,
    products,
    quadratures,
    squared_exponentials,
    sums,
)
from .expectations import expectation, quadrature_expectation

__all__ = ["expectation", "quadrature_expectation"]
