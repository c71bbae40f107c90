"""Profiling helpers (SURVEY.md §5: the reference has no tracing built in;
"TPU build: use jax.profiler traces + the same metric names").

``profile`` wraps ``jax.profiler.trace`` so a training loop can be traced to
a TensorBoard-/Perfetto-readable directory; ``annotate`` names a region so
host-side phases show up in the trace timeline.

Example::

    with profile("/tmp/gp-trace"):
        for step in range(100):
            with annotate("train_step"):
                loss = trainer.step(batch)
    # tensorboard --logdir /tmp/gp-trace  (Profile tab), or open in Perfetto
"""
from __future__ import annotations

import contextlib
from typing import Generator

import jax

__all__ = ["annotate", "profile"]

annotate = jax.profiler.TraceAnnotation


@contextlib.contextmanager
def profile(log_dir: str, *, create_perfetto_link: bool = False) -> Generator[None, None, None]:
    """Traces everything inside the block to ``log_dir``."""
    with jax.profiler.trace(log_dir, create_perfetto_link=create_perfetto_link):
        yield
