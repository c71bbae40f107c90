"""Machine sharding of the benchmark grid (reference ``benchmark/sharding.py``):
embarrassingly parallel split of the task list by index."""
from __future__ import annotations

from typing import List, Sequence, TypeVar

T = TypeVar("T")

__all__ = ["shard_tasks"]


def shard_tasks(tasks: Sequence[T], shard_index: int, num_shards: int) -> List[T]:
    if not (0 <= shard_index < num_shards):
        raise ValueError(f"shard_index {shard_index} out of range for {num_shards} shards")
    return [t for i, t in enumerate(tasks) if i % num_shards == shard_index]
