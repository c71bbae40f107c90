"""TensorBoard monitoring tasks (reference
``/root/reference/gpflow/monitor/tensorboard.py:59-232``).

Uses ``torch.utils.tensorboard.SummaryWriter`` as the event-file writer (the
TF summary writer is not available in this stack); the emitted event files are
standard TensorBoard logs.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Union

import numpy as np

from ..base import Parameter
from ..models.model import BayesianModel
from ..utilities import parameter_dict
from .base import MonitorTask

__all__ = ["ImageToTensorBoard", "ModelToTensorBoard", "ScalarToTensorBoard", "ToTensorBoard"]


class ToTensorBoard(MonitorTask):
    """Writer-owning base. Writers are shared per ``log_dir`` (tasks
    targeting the same directory must not interleave separate event files);
    each holds an open file handle and a flush thread, so long-lived sweep
    processes should release them with :meth:`close_writer` /
    :meth:`close_all_writers` when a run's directory is done."""

    writers: Dict[str, Any] = {}

    def __init__(self, log_dir: str) -> None:
        try:
            from torch.utils.tensorboard import SummaryWriter
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "TensorBoard monitoring requires torch.utils.tensorboard"
            ) from e
        if log_dir not in self.writers:
            self.writers[log_dir] = SummaryWriter(log_dir=log_dir)
        self.log_dir = log_dir
        self.file_writer = self.writers[log_dir]

    def __call__(self, step: int, **kwargs: Any) -> None:
        super().__call__(step, **kwargs)
        self.file_writer.flush()

    @classmethod
    def close_writer(cls, log_dir: str) -> None:
        """Flushes, closes, and evicts the shared writer for ``log_dir``
        (no-op if none exists). Call when a run's directory is finished —
        e.g. per trial in a hyperparameter sweep — to release its file
        handle and flush thread."""
        writer = cls.writers.pop(log_dir, None)
        if writer is not None:
            writer.close()

    @classmethod
    def close_all_writers(cls) -> None:
        """Flushes, closes, and evicts every shared writer."""
        for log_dir in list(cls.writers):
            cls.close_writer(log_dir)


class ModelToTensorBoard(ToTensorBoard):
    """Writes matching model parameters as scalars
    (reference ``tensorboard.py:59-136``)."""

    def __init__(
        self,
        log_dir: str,
        model: BayesianModel,
        *,
        max_size: int = 3,
        keywords_to_monitor: Optional[List[str]] = None,
        left_strip_character: str = ".",
    ) -> None:
        super().__init__(log_dir)
        self.model = model
        self.max_size = max_size
        self.keywords_to_monitor = (
            keywords_to_monitor if keywords_to_monitor is not None else ["kernel", "likelihood"]
        )
        self.summarize_all = "*" in self.keywords_to_monitor
        self.left_strip_character = left_strip_character

    def run(self, **unused_kwargs: Any) -> None:
        for name, parameter in parameter_dict(self.model).items():
            if self.summarize_all or any(k in name for k in self.keywords_to_monitor):
                name = name.lstrip(self.left_strip_character)
                self._summarize_parameter(name, parameter)

    def _summarize_parameter(self, name: str, param: Parameter) -> None:
        values = np.reshape(np.asarray(param.value), (-1,))
        size = values.shape[0]
        if size == 1:
            self.file_writer.add_scalar(name, float(values[0]), self.current_step)
        else:
            it = range(size) if self.max_size == -1 else range(min(size, self.max_size))
            for i in it:
                self.file_writer.add_scalar(f"{name}[{i}]", float(values[i]), self.current_step)


class ScalarToTensorBoard(ToTensorBoard):
    """Stores a callback's return value (reference ``tensorboard.py:139-164``)."""

    def __init__(self, log_dir: str, callback: Callable[..., float], name: str) -> None:
        super().__init__(log_dir)
        self.name = name
        self.callback = callback

    def run(self, **kwargs: Any) -> None:
        self.file_writer.add_scalar(self.name, float(self.callback(**kwargs)), self.current_step)


class ImageToTensorBoard(ToTensorBoard):
    """Renders a matplotlib figure into TensorBoard
    (reference ``tensorboard.py:167-232``)."""

    def __init__(
        self,
        log_dir: str,
        plotting_function: Callable[..., None],
        name: Optional[str] = None,
        *,
        fig_kw: Optional[Dict[str, Any]] = None,
        subplots_kw: Optional[Dict[str, Any]] = None,
    ) -> None:
        super().__init__(log_dir)
        self.plotting_function = plotting_function
        self.name = name or "image"
        self.fig_kw = fig_kw or {}
        self.subplots_kw = subplots_kw or {}

    def run(self, **unused_kwargs: Any) -> None:
        # a bare Figure carries FigureCanvasBase, which has no buffer_rgba;
        # attaching FigureCanvasAgg explicitly renders via Agg WITHOUT
        # touching the process-global matplotlib backend (a matplotlib.use
        # call here used to silently break interactive/notebook plotting)
        from matplotlib.backends.backend_agg import FigureCanvasAgg
        from matplotlib.figure import Figure

        fig = Figure(**self.fig_kw)
        canvas = FigureCanvasAgg(fig)
        if self.subplots_kw:
            axes = fig.subplots(**self.subplots_kw)
        else:
            axes = fig.add_subplot(111)
        self.plotting_function(fig, axes)
        canvas.draw()
        buf = np.asarray(canvas.buffer_rgba())[..., :3]  # [H, W, 3]
        self.file_writer.add_image(self.name, buf, self.current_step, dataformats="HWC")
