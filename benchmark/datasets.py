"""Benchmark datasets (reference ``benchmark/datasets.py:39-80``): synthetic
TINY sets plus generated MEDIUM/LARGE regression/classification tasks (the
reference's UCI downloads are replaced by deterministic synthetic generators —
this environment has no network egress)."""
from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

from .registry import Registry

__all__ = ["Dataset", "DATASETS", "get_dataset"]


class Dataset(NamedTuple):
    name: str
    train: Tuple[np.ndarray, np.ndarray]
    test: Tuple[np.ndarray, np.ndarray]


DATASETS: Registry = Registry("dataset")


def _split(X: np.ndarray, Y: np.ndarray, name: str, test_frac: float = 0.2) -> Dataset:
    n = len(X)
    n_test = max(1, int(n * test_frac))
    return Dataset(name, (X[:-n_test], Y[:-n_test]), (X[-n_test:], Y[-n_test:]))


def _tiny_linear() -> Dataset:
    rng = np.random.RandomState(0)
    X = rng.rand(20, 1)
    Y = 2.0 * X + 0.1 * rng.randn(20, 1)
    return _split(X, Y, "tiny_linear")


def _tiny_sine() -> Dataset:
    rng = np.random.RandomState(1)
    X = rng.rand(20, 1) * 6
    Y = np.sin(X) + 0.1 * rng.randn(20, 1)
    return _split(X, Y, "tiny_sine")


def _synth_regression(n: int, d: int, seed: int, name: str) -> Dataset:
    rng = np.random.RandomState(seed)
    X = rng.rand(n, d) * 4
    w = rng.randn(d, 1)
    Y = np.sin(X @ w) + 0.2 * np.cos(2 * X[:, :1]) + 0.1 * rng.randn(n, 1)
    return _split(X, Y, name)


def _banana() -> Dataset:
    rng = np.random.RandomState(4)
    n = 400
    X = rng.randn(n, 2)
    p = 1 / (1 + np.exp(-(np.sin(2 * X[:, 0]) + X[:, 1])))
    Y = (rng.rand(n) < p).astype(float)[:, None]
    return _split(X, Y, "banana")


DATASETS.register("tiny_linear", _tiny_linear, tags=["TINY", "regression"])
DATASETS.register("tiny_sine", _tiny_sine, tags=["TINY", "regression"])
DATASETS.register(
    "synth_medium", lambda: _synth_regression(1000, 4, 2, "synth_medium"),
    tags=["MEDIUM", "regression"],
)
DATASETS.register(
    "synth_large", lambda: _synth_regression(100_000, 8, 3, "synth_large"),
    tags=["LARGE", "regression"],
)
DATASETS.register("banana", _banana, tags=["MEDIUM", "classification"])


def get_dataset(name: str) -> Dataset:
    return DATASETS.get(name)()
