"""Import-path alias for reference parity: the reference exposes the
bijector helpers as ``gpflow.utilities.bijectors`` (reference
``gpflow/utilities/bijectors.py``). Ours live in ``gpflow_tpu.bijectors``
(together with the full in-house bijector set that replaces TFP); this
module re-exports the helper trio so user imports port unchanged.

The re-exports resolve lazily (module ``__getattr__``): ``gpflow_tpu.bijectors``
imports ``utilities.shapes`` for its contracts, which initializes this package,
so an eager ``from ..bijectors import ...`` here would re-enter the partially
initialized module and fail.
"""
from typing import Any

__all__ = [
    "positive",
    "triangular",
    "triangular_size",
]


def __getattr__(name: str) -> Any:
    if name in __all__:
        from .. import bijectors as _bijectors

        return getattr(_bijectors, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__() -> list:
    return sorted(__all__)
