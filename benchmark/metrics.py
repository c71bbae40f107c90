"""Benchmark metric definitions (reference ``benchmark/metrics.py:20-136``)."""
from __future__ import annotations

import enum
from typing import NamedTuple, Optional

__all__ = ["METRICS", "Metric", "MetricOrientation"]


class MetricOrientation(enum.Enum):
    LOWER_IS_BETTER = "lower"
    GREATER_IS_BETTER = "greater"


class Metric(NamedTuple):
    name: str
    pretty_name: str
    orientation: MetricOrientation
    unit: Optional[str]


METRICS = [
    Metric("n_training_iterations", "Training iterations", MetricOrientation.LOWER_IS_BETTER, None),
    Metric("training_time", "Time to train", MetricOrientation.LOWER_IS_BETTER, "s"),
    Metric(
        "training_iteration_time", "Time to run one iteration",
        MetricOrientation.LOWER_IS_BETTER, "s",
    ),
    Metric("prediction_time", "Time to predict Y", MetricOrientation.LOWER_IS_BETTER, "s"),
    Metric("nlpd", "Negative Log Predictive Density", MetricOrientation.LOWER_IS_BETTER, None),
    Metric("mae", "Mean Absolute Error", MetricOrientation.LOWER_IS_BETTER, None),
    Metric("rmse", "Root Mean Squared Error", MetricOrientation.LOWER_IS_BETTER, None),
    Metric("accuracy", "Classification accuracy", MetricOrientation.GREATER_IS_BETTER, None),
    Metric(
        "posterior_build_time", "Time to build posterior",
        MetricOrientation.LOWER_IS_BETTER, "s",
    ),
    Metric(
        "posterior_prediction_time", "Time to predict test Y (posterior)",
        MetricOrientation.LOWER_IS_BETTER, "s",
    ),
    Metric(
        "posterior_nlpd", "Negative Log Predictive Density (posterior)",
        MetricOrientation.LOWER_IS_BETTER, None,
    ),
]
