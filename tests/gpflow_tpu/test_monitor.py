"""Monitor scheduling + TensorBoard writer tasks (reference test strategy §4:
tests/gpflow/monitor/)."""
import os

import numpy as np
import pytest

from gpflow_tpu import kernels, likelihoods
from gpflow_tpu.models import SVGP
from gpflow_tpu.monitor import (
    ExecuteCallback,
    Monitor,
    MonitorTaskGroup,
    ModelToTensorBoard,
    ScalarToTensorBoard,
)

rng = np.random.RandomState(0)


def test_task_groups_respect_periods():
    calls = {"fast": 0, "slow": 0}
    fast = MonitorTaskGroup(ExecuteCallback(lambda **kw: calls.__setitem__("fast", calls["fast"] + 1)), period=1)
    slow = MonitorTaskGroup(ExecuteCallback(lambda **kw: calls.__setitem__("slow", calls["slow"] + 1)), period=5)
    monitor = Monitor(fast, slow)
    for step in range(10):
        monitor(step)
    assert calls["fast"] == 10
    assert calls["slow"] == 2  # steps 0 and 5


def test_execute_callback_receives_kwargs():
    seen = []
    task = ExecuteCallback(lambda loss=None, **kw: seen.append(loss))
    Monitor(MonitorTaskGroup(task))(0, loss=1.25)
    assert seen == [1.25]


def test_tensorboard_tasks_write_event_files(tmp_path):
    model = SVGP(
        kernel=kernels.SquaredExponential(),
        likelihood=likelihoods.Gaussian(0.1),
        inducing_variable=rng.randn(4, 2),
        num_data=8,
    )
    log_dir = str(tmp_path / "logs")
    tasks = MonitorTaskGroup(
        [
            ModelToTensorBoard(log_dir, model),
            ScalarToTensorBoard(log_dir, lambda: 0.5, "metric"),
        ]
    )
    monitor = Monitor(tasks)
    for step in range(3):
        monitor(step)
    files = [f for root, _, fs in os.walk(log_dir) for f in fs]
    assert any("tfevents" in f or "events" in f for f in files), files


def test_image_to_tensorboard_runs(tmp_path):
    """Regression (round-2 review): a bare matplotlib Figure has no Agg
    canvas attached; ImageToTensorBoard must draw through FigureCanvasAgg."""
    from gpflow_tpu.monitor import ImageToTensorBoard

    def plot(fig, ax):
        ax.plot([0.0, 1.0], [0.0, 1.0])

    log_dir = str(tmp_path / "img_logs")
    task = ImageToTensorBoard(log_dir, plot, "line")
    Monitor(MonitorTaskGroup([task]))(0)
    files = [f for root, _, fs in os.walk(log_dir) for f in fs]
    assert any("tfevents" in f or "events" in f for f in files), files
