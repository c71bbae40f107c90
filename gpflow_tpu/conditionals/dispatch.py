"""Conditional dispatchers (reference ``/root/reference/gpflow/conditionals/dispatch.py``).

Note (matching the reference deprecation): the supported extension point for
new conditionals is subclassing ``gpflow_tpu.posteriors.AbstractPosterior``
and registering ``get_posterior_class``.
"""
from ..utilities import Dispatcher

__all__ = ["conditional", "sample_conditional"]

conditional = Dispatcher("conditional")
sample_conditional = Dispatcher("sample_conditional")
