"""Kuu/Kuf dispatchers (reference ``/root/reference/gpflow/covariances/dispatch.py:17-18``)."""
from ..utilities.multipledispatch import Dispatcher

__all__ = ["Kuf", "Kuu"]

Kuu = Dispatcher("Kuu")
Kuf = Dispatcher("Kuf")
