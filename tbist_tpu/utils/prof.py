"""Profiling hooks (SURVEY §5 tracing/profiling).

The reference's only instrumentation is wall-clock prints (app.py:50,78).
Here: a ``jax.profiler`` trace context for capturing device timelines
(viewable in TensorBoard/Perfetto), and an optional always-on trace server.
"""

from __future__ import annotations

import contextlib
import os

import jax

from tbist_tpu.utils.logging import logger


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tbist_trace"):
    """Capture a device trace around a block:

    >>> with prof.trace("/tmp/trace"):
    ...     stylize(...)
    """
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)


def start_server(port: int = 9999) -> None:
    """Start the profiler server for on-demand capture (tensorboard)."""
    jax.profiler.start_server(port)
    logger.info("jax profiler server on :%d", port)
