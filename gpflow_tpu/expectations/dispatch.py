"""Expectation dispatchers (reference
``/root/reference/gpflow/expectations/dispatch.py``)."""
from ..utilities import Dispatcher

__all__ = ["expectation", "quadrature_expectation", "variational_expectation"]

expectation = Dispatcher("expectation")
quadrature_expectation = Dispatcher("quadrature_expectation")
# Declared-but-unregistered in the reference too (``dispatch.py:19``); kept
# for import-level parity.
variational_expectation = Dispatcher("variational_expectation")
