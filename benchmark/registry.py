"""Name/tag registries (reference ``benchmark/registry.py:37-99``)."""
from __future__ import annotations

from typing import Any, Callable, Dict, Generic, Iterable, List, Optional, Set, TypeVar

T = TypeVar("T")

__all__ = ["Registry", "TaggedItem"]


class TaggedItem(Generic[T]):
    def __init__(self, name: str, value: T, tags: Iterable[str] = ()) -> None:
        self.name = name
        self.value = value
        self.tags: Set[str] = set(tags)


class Registry(Generic[T]):
    """Registry keyed by name, filterable by tag."""

    def __init__(self, kind: str) -> None:
        self.kind = kind
        self._items: Dict[str, TaggedItem[T]] = {}

    def register(self, name: str, value: T, tags: Iterable[str] = ()) -> T:
        if name in self._items:
            raise ValueError(f"{self.kind} {name!r} already registered")
        self._items[name] = TaggedItem(name, value, tags)
        return value

    def get(self, name: str) -> T:
        if name not in self._items:
            raise KeyError(f"Unknown {self.kind} {name!r}; known: {sorted(self._items)}")
        return self._items[name].value

    def names(self, tag: Optional[str] = None) -> List[str]:
        if tag is None:
            return sorted(self._items)
        return sorted(n for n, item in self._items.items() if tag in item.tags)

    def tags_of(self, name: str) -> Set[str]:
        return set(self._items[name].tags)
