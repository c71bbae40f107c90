"""Benchmark harness for gpflow_tpu (TPU port of ``/root/reference/benchmark/``,
SURVEY.md layer 8 / A.3): registries of datasets, models, and metrics; suites
composed as dataset x model grids; ``python -m benchmark.run <suite> <dest>``
writes a metrics table; ``--shard i/n`` splits the task grid across machines.
"""
from . import benchmarks, datasets, metrics, models, registry, sharding

__all__ = ["benchmarks", "datasets", "metrics", "models", "registry", "sharding"]
