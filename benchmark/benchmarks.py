"""Benchmark suites (reference ``benchmark/benchmarks.py:29-112``): a suite is
a dataset x model grid filtered by tag compatibility."""
from __future__ import annotations

from typing import List, NamedTuple

from .datasets import DATASETS
from .models import MODELS
from .registry import Registry

__all__ = ["SUITES", "BenchmarkSet", "Task", "get_suite"]


class Task(NamedTuple):
    dataset: str
    model: str
    repetitions: int
    maxiter: int


class BenchmarkSet(NamedTuple):
    name: str
    datasets: List[str]
    models: List[str]
    repetitions: int
    maxiter: int

    def get_tasks(self) -> List[Task]:
        import sys

        from .datasets import is_available

        tasks = []
        for d in self.datasets:
            d_tags = DATASETS.tags_of(d)
            if not is_available(d):
                # no silent caps: REAL_DATA sets whose local file is absent
                # are skipped with an explicit note (datasets.MissingDataFile
                # explains how to provide the file)
                print(
                    f"benchmark: skipping dataset {d!r} (REAL_DATA file not in "
                    "$GPFLOW_TPU_DATA_DIR)",
                    file=sys.stderr,
                )
                continue
            for m in self.models:
                m_tags = MODELS.tags_of(m)
                if "LARGE" in d_tags and "all_sizes" not in m_tags:
                    continue  # dense N^3 models are excluded from LARGE datasets
                if "classification" in d_tags and "classification" not in m_tags:
                    continue
                # multiclass datasets pair only with multiclass models and
                # vice versa (a Bernoulli/Gaussian model on 10-class labels
                # is not a meaningful benchmark row)
                if ("multiclass" in d_tags) != ("multiclass" in m_tags):
                    continue
                tasks.append(Task(d, m, self.repetitions, self.maxiter))
        return tasks


SUITES: Registry = Registry("suite")

SUITES.register(
    "integration_test",
    BenchmarkSet(
        "integration_test",
        datasets=["tiny_linear", "tiny_sine"],
        models=["gpr", "svgp"],
        repetitions=2,
        maxiter=10,
    ),
)
SUITES.register(
    "ci",
    BenchmarkSet(
        "ci",
        datasets=["synth_medium"],
        models=["gpr", "sgpr", "vgp", "svgp"],
        repetitions=5,
        maxiter=100,
    ),
)
SUITES.register(
    "uci",
    BenchmarkSet(
        "uci",
        datasets=DATASETS.names("REAL_DATA"),
        models=["gpr", "sgpr", "vgp", "svgp", "svgp_multiclass", "svgp_softmax"],
        repetitions=5,
        maxiter=1000,
    ),
)
SUITES.register(
    "uci_multiclass",
    BenchmarkSet(
        "uci_multiclass",
        datasets=["digits", "wine"],
        models=["svgp_multiclass", "svgp_softmax"],
        repetitions=5,
        maxiter=1000,
    ),
)
SUITES.register(
    "uci_regression",
    BenchmarkSet(
        "uci_regression",
        datasets=[d for d in DATASETS.names("REAL_DATA") if d not in ("digits", "wine")],
        models=["gpr", "sgpr", "vgp", "svgp"],
        repetitions=5,
        maxiter=1000,
    ),
)
SUITES.register(
    "full",
    BenchmarkSet(
        "full",
        datasets=DATASETS.names(),
        models=MODELS.names(),
        repetitions=5,
        maxiter=1000,
    ),
)


def get_suite(name: str) -> BenchmarkSet:
    return SUITES.get(name)
