"""Monitor scheduling + TensorBoard writer tasks (strategy ported from
reference ``tests/gpflow/test_monitor.py``): per-task smoke tests, argument
routing, group periodicity, event-file growth under real training, and the
Scipy ``step_callback`` integration."""
import os

import numpy as np
import pytest

import gpflow_tpu
from gpflow_tpu import kernels, likelihoods
from gpflow_tpu.models import GPR, SVGP
from gpflow_tpu.monitor import (
    ExecuteCallback,
    ImageToTensorBoard,
    Monitor,
    MonitorTask,
    MonitorTaskGroup,
    ModelToTensorBoard,
    ScalarToTensorBoard,
)
from gpflow_tpu.optimizers import Scipy

rng = np.random.RandomState(0)
NUM_DATA = 20


@pytest.fixture
def model():
    data = (rng.randn(NUM_DATA, 2), rng.randn(NUM_DATA, 2))
    kernel = kernels.SquaredExponential(lengthscales=[1.0, 2.0])
    return GPR(data, kernel=kernel, noise_variance=0.01)


@pytest.fixture
def monitor(model, tmp_path):
    log_dir = str(tmp_path)

    def lml_callback():
        return model.log_marginal_likelihood()

    def print_callback():
        print("foo")

    return Monitor(
        MonitorTaskGroup(
            [
                ModelToTensorBoard(log_dir, model),
                ScalarToTensorBoard(log_dir, lml_callback, "lml"),
            ],
            period=2,
        ),
        MonitorTaskGroup(ExecuteCallback(print_callback), period=1),
    )


def _dir_size(d) -> int:
    return sum(f.stat().st_size for f in d.glob("**/*") if f.is_file())


# --- per-task smoke tests ----------------------------------------------------


def test_execute_callback():
    task = ExecuteCallback(lambda: print("ExecuteCallback test"))
    task(0)


def test_image_to_tensorboard_subplot_grid(tmp_path):
    def plotting_cb(fig, axes):
        axes[0, 0].plot(np.random.randn(2), np.random.randn(2))
        axes[1, 0].plot(np.random.randn(2), np.random.randn(2))
        axes[0, 1].plot(np.random.randn(2), np.random.randn(2))
        axes[1, 1].plot(np.random.randn(2), np.random.randn(2))

    task = ImageToTensorBoard(
        str(tmp_path),
        plotting_cb,
        "image",
        fig_kw=dict(figsize=(10, 10)),
        subplots_kw=dict(sharex=True, nrows=2, ncols=2),
    )
    task(0)
    files = [f for _, _, fs in os.walk(str(tmp_path)) for f in fs]
    assert any("tfevents" in f or "events" in f for f in files), files


def test_scalar_to_tensorboard(tmp_path):
    task = ScalarToTensorBoard(str(tmp_path), lambda: 0.0, "scalar")
    task(0)


def test_scalar_to_tensorboard_with_argument(tmp_path):
    def scalar_cb(x=None):
        assert x is not None
        return 2 * x

    task = ScalarToTensorBoard(str(tmp_path), scalar_cb, "scalar")
    task(0, x=1.0)


def test_scalar_to_tensorboard_with_wrong_keyword_argument(tmp_path):
    def scalar_cb(x=None):
        return 0.0

    task = ScalarToTensorBoard(str(tmp_path), scalar_cb, "scalar")
    with pytest.raises(TypeError, match="unexpected keyword argument 'y'"):
        task(0, y=1.0)


def test_model_to_tensorboard(model, tmp_path):
    task = ModelToTensorBoard(str(tmp_path), model)
    task(0)


def test_model_to_tensorboard_keyword_filter_and_max_size(model, tmp_path):
    """Only parameters matching keywords_to_monitor are written; vector
    parameters are truncated to max_size entries ('*' monitors everything)."""
    recorded = []

    class SpyModelTask(ModelToTensorBoard):
        def _summarize_parameter(self, name, param):
            recorded.append(name)
            super()._summarize_parameter(name, param)

    task = SpyModelTask(str(tmp_path), model, keywords_to_monitor=["kernel"])
    task(0)
    assert recorded and all("kernel" in n for n in recorded)
    assert not any("likelihood" in n for n in recorded)

    recorded.clear()
    task_all = SpyModelTask(str(tmp_path), model, keywords_to_monitor=["*"])
    task_all(0)
    assert any("likelihood" in n for n in recorded)


def test_execute_callback_argument_routing(capsys):
    def cb1(x=None, **_):
        assert x is not None
        print(x)

    def cb2(**_):
        print(2)

    def cb3(y=None, **_):
        assert y is not None
        print(y)

    group1 = MonitorTaskGroup([ExecuteCallback(cb1), ExecuteCallback(cb2)])
    group2 = MonitorTaskGroup(ExecuteCallback(cb3))
    monitor = Monitor(group1, group2)
    monitor(0, x=1, y=3)
    out, _ = capsys.readouterr()
    assert out == "1\n2\n3\n"


# --- Monitor / MonitorTaskGroup ---------------------------------------------


def _none():
    return None


@pytest.mark.parametrize(
    "task_or_tasks",
    [
        ExecuteCallback(_none),
        [ExecuteCallback(_none)],
        [ExecuteCallback(_none), ExecuteCallback(_none)],
    ],
)
def test_monitor_task_group_and_monitor(task_or_tasks):
    group = MonitorTaskGroup(task_or_tasks, period=2)
    assert isinstance(group.tasks, list)
    group(0)
    Monitor(group)(0)


def test_monitor(monitor):
    monitor(0)


def test_periodicity_group(capsys):
    task_a = ExecuteCallback(lambda: print("a", end=" "))
    task_b = ExecuteCallback(lambda: print("b", end=" "))
    task_X = ExecuteCallback(lambda: print("X", end=" "))

    group_often = MonitorTaskGroup([task_a, task_b], period=1)
    group_seldom = MonitorTaskGroup([task_X], period=3)
    monitor = Monitor(group_often, group_seldom)
    for i in range(7):
        monitor(i)

    out, _ = capsys.readouterr()
    assert out == "a b X a b a b a b X a b a b a b X "


def test_task_groups_respect_periods():
    calls = {"fast": 0, "slow": 0}
    fast = MonitorTaskGroup(
        ExecuteCallback(lambda **kw: calls.__setitem__("fast", calls["fast"] + 1)), period=1
    )
    slow = MonitorTaskGroup(
        ExecuteCallback(lambda **kw: calls.__setitem__("slow", calls["slow"] + 1)), period=5
    )
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


# --- functionality: event files + training integration ----------------------


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

    def plot(fig, ax):
        ax.plot([0.0, 1.0], [0.0, 1.0])

    log_dir = str(tmp_path / "img_logs")
    task = ImageToTensorBoard(log_dir, plot, "line")
    Monitor(MonitorTaskGroup([task]))(0)
    files = [f for root, _, fs in os.walk(log_dir) for f in fs]
    assert any("tfevents" in f or "events" in f for f in files), files


def test_logdir_grows_during_training(monitor, model, tmp_path):
    """Event files are written during a real optimization loop (reference
    ``test_monitor.py:299-314``)."""
    from gpflow_tpu.utilities import training_loop

    monitor(0)
    size_before = _dir_size(tmp_path)
    assert size_before > 0

    training_loop(model.training_loss, var_list=model.trainable_variables, maxiter=2)
    for step in range(1, 3):
        monitor(step)
    assert _dir_size(tmp_path) > size_before


def test_scipy_monitor_as_step_callback(monitor, model):
    Scipy().minimize(
        model.training_loss,
        model.trainable_variables,
        step_callback=monitor,
        options={"maxiter": 3},
    )


def test_scipy_monitor_task_called_every_iteration(model):
    class DummyTask(MonitorTask):
        def run(self, **kwargs):
            pass

    task = DummyTask()
    monitor = Monitor(MonitorTaskGroup(task, period=1))
    Scipy().minimize(
        model.training_loss,
        model.trainable_variables,
        step_callback=monitor,
        options={"maxiter": 10},
    )
    assert task.current_step > 1


def test_writer_close_and_evict(tmp_path):
    """close_writer releases the shared per-directory SummaryWriter (file
    handle + flush thread); without an evict path, long sweeps leak one
    writer per trial directory for the process lifetime (round-2 review)."""
    from gpflow_tpu.monitor import ToTensorBoard

    d1, d2 = str(tmp_path / "run1"), str(tmp_path / "run2")
    t1 = ScalarToTensorBoard(d1, lambda: 1.0, "a")
    t2 = ScalarToTensorBoard(d2, lambda: 2.0, "b")
    t1(0)
    t2(0)
    assert d1 in ToTensorBoard.writers and d2 in ToTensorBoard.writers
    ToTensorBoard.close_writer(d1)
    assert d1 not in ToTensorBoard.writers and d2 in ToTensorBoard.writers
    ToTensorBoard.close_writer(d1)  # idempotent
    # a new task for the closed dir re-opens cleanly
    t1b = ScalarToTensorBoard(d1, lambda: 3.0, "a")
    t1b(1)
    ToTensorBoard.close_all_writers()
    assert ToTensorBoard.writers == {}


def test_image_to_tensorboard_does_not_clobber_matplotlib_backend(tmp_path):
    import matplotlib

    before = matplotlib.get_backend()
    task = ImageToTensorBoard(str(tmp_path), lambda fig, ax: ax.plot([0, 1]), "img")
    task(0)
    assert matplotlib.get_backend() == before


def test_scipy_step_callback_sees_current_parameters(model, tmp_path):
    """The per-iteration callback must observe the CURRENT iterate in the
    live Parameters (round-2 review: monitors logged the initial values for
    the whole run because assignment only happened after scipy returned)."""
    import gpflow_tpu

    seen = []

    def cb(step, variables, values):
        seen.append(float(np.ravel(np.asarray(model.kernel.lengthscales.value))[0]))

    gpflow_tpu.optimizers.Scipy().minimize(
        model.training_loss, model.trainable_variables,
        step_callback=cb, options=dict(maxiter=10),
    )
    assert len(seen) >= 2
    assert len({round(v, 12) for v in seen}) > 1, (
        "callback saw a frozen lengthscale: parameters not synced per iteration"
    )
    # and the final model state matches the last callback observation
    final = float(np.ravel(np.asarray(model.kernel.lengthscales.value))[0])
    np.testing.assert_allclose(seen[-1], final, rtol=1e-9)
