"""Expectation dispatchers (reference
``/root/reference/gpflow/expectations/dispatch.py``)."""
from ..utilities import Dispatcher

__all__ = ["expectation", "quadrature_expectation"]

expectation = Dispatcher("expectation")
quadrature_expectation = Dispatcher("quadrature_expectation")
