"""CI helpers (reference ``/root/reference/gpflow/ci_utils.py:21-48``)."""
from __future__ import annotations

import os
from typing import Any, Iterable, Type

__all__ = ["is_continuous_integration", "reduce_in_tests", "subclasses"]


def is_continuous_integration() -> bool:
    """True when running under CI (``CI`` env var set and ``DOCS`` not)."""
    if "DOCS" in os.environ:
        return False
    return "CI" in os.environ


def reduce_in_tests(n: int, test_n: int = 2) -> int:
    """Caps expensive loop counts on CI."""
    return test_n if is_continuous_integration() else n


def subclasses(cls: Type[Any]) -> Iterable[Type[Any]]:
    """Yields all (not just direct) subclasses of ``cls``."""
    for subclass in cls.__subclasses__():
        yield from subclasses(subclass)
        yield subclass
