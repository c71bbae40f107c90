"""Monitoring tasks and scheduler (reference
``/root/reference/gpflow/monitor/base.py:28-151``)."""
from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, Callable, Collection, Union

__all__ = ["ExecuteCallback", "Monitor", "MonitorTask", "MonitorTaskGroup"]


class MonitorTask(ABC):
    """Callable monitoring task; subclasses implement ``run``."""

    def __call__(self, step: int, **kwargs: Any) -> None:
        self.current_step = int(step)
        self.run(**kwargs)

    @abstractmethod
    def run(self, **kwargs: Any) -> None:
        raise NotImplementedError


class ExecuteCallback(MonitorTask):
    """Executes a callback as a task (reference ``base.py:59-73``)."""

    def __init__(self, callback: Callable[..., None]) -> None:
        self.callback = callback

    def run(self, **kwargs: Any) -> None:
        self.callback(**kwargs)


class MonitorTaskGroup:
    """Tasks that run at the same frequency ``period``
    (reference ``base.py:76-115``)."""

    def __init__(
        self, task_or_tasks: Union[Collection[MonitorTask], MonitorTask], period: int = 1
    ) -> None:
        self._tasks: Collection[MonitorTask] = []
        self.tasks = task_or_tasks  # type: ignore[assignment]
        self._period = period

    @property
    def tasks(self) -> Collection[MonitorTask]:
        return self._tasks

    @tasks.setter
    def tasks(self, task_or_tasks: Union[Collection[MonitorTask], MonitorTask]) -> None:
        if isinstance(task_or_tasks, MonitorTask):
            self._tasks = [task_or_tasks]
        else:
            assert isinstance(task_or_tasks, Collection)
            self._tasks = list(task_or_tasks)

    def __call__(self, step: int, **kwargs: Any) -> None:
        if step % self._period == 0:
            for task in self.tasks:
                task(step, **kwargs)


class Monitor:
    """Runs task groups at their periodicities (reference ``base.py:118-151``).

    Example::

        fast = MonitorTaskGroup([model_task, lml_task], period=1)
        slow = MonitorTaskGroup(image_task, period=5)
        monitor = Monitor(fast, slow)
        for step in range(1000):
            ...optimization step...
            monitor(step)
    """

    def __init__(self, *task_groups: MonitorTaskGroup) -> None:
        self.task_groups = task_groups

    def __call__(self, step: int, **kwargs: Any) -> None:
        for group in self.task_groups:
            group(step, **kwargs)
