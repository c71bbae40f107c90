"""Experimental code: expect breaking changes, poor documentation, and bugs
(reference ``/root/reference/gpflow/experimental/__init__.py``)."""
from . import utils

__all__ = ["utils"]
