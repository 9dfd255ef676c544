"""Infra utilities — reference C21 (``dnnlib.util``) + the observability the
reference lacks (SURVEY §5: "tracing/profiling: none … new framework:
jax.profiler trace + per-step timing built in").

- ``EasyDict``: attribute-style dict (`dnnlib/util.py:40`).
- ``Logger``: stdout/stderr tee to a file (`dnnlib/util.py:56-117`).
- ``StepTimer``: wall-clock per-step timing with device sync.
- ``trace_profile``: context manager emitting a TensorBoard-readable
  ``jax.profiler`` trace.
"""

from __future__ import annotations

import contextlib
import os
import sys
import time
from typing import Any, Optional

import jax
import numpy as np


class EasyDict(dict):
    """dict with attribute access."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        del self[name]


class _StderrTee:
    """Companion stream: writes reach the log file AND the real stderr —
    crash tracebacks/warnings land in the one artifact inspected after a
    failed run."""

    def __init__(self, logger: "Logger"):
        self._logger = logger

    def write(self, text: str) -> None:
        if len(text) == 0:
            return
        if self._logger.file is not None:
            self._logger.file.write(text)
        self._logger.stderr.write(text)
        if self._logger.should_flush:
            self.flush()

    def flush(self) -> None:
        if self._logger.file is not None:
            self._logger.file.flush()
        self._logger.stderr.flush()


class Logger:
    """Tee stdout (and, by default, stderr) to a log file — the dnnlib
    Logger behaviour the reference wraps its drivers in."""

    def __init__(self, file_name: Optional[str] = None, mode: str = "w",
                 should_flush: bool = True, capture_stderr: bool = True):
        self.file = open(file_name, mode) if file_name else None
        self.should_flush = should_flush
        self.stdout = sys.stdout
        self.stderr = sys.stderr
        self._stderr_tee = _StderrTee(self) if capture_stderr else None
        sys.stdout = self
        if self._stderr_tee is not None:
            sys.stderr = self._stderr_tee

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def write(self, text: str) -> None:
        if len(text) == 0:
            return
        if self.file is not None:
            self.file.write(text)
        self.stdout.write(text)
        if self.should_flush:
            self.flush()

    def flush(self) -> None:
        if self.file is not None:
            self.file.flush()
        self.stdout.flush()

    def close(self) -> None:
        if sys.stdout is self:
            sys.stdout = self.stdout
        if self._stderr_tee is not None and sys.stderr is self._stderr_tee:
            sys.stderr = self.stderr
        if self.file is not None:
            self.file.close()
            self.file = None


class StepTimer:
    """Per-step wall timing with ``block_until_ready`` sync; keeps a history
    so drivers can report steps/sec excluding compile."""

    def __init__(self):
        self.times: list[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    def steps_per_sec(self, skip: int = 1) -> float:
        """Mean throughput, skipping the first ``skip`` (compile) steps."""
        ts = self.times[skip:] if len(self.times) > skip else self.times
        return 1.0 / float(np.mean(ts)) if ts else 0.0


def aggregate_loss_dict(agg_loss_dict):
    """Mean per key over a list of loss dicts (`utils/train_utils.py:2-13`)."""
    mean_vals: dict = {}
    for output in agg_loss_dict:
        for key, val in output.items():
            mean_vals.setdefault(key, []).append(val)
    return {
        key: (sum(vals) / len(vals)) if vals else 0
        for key, vals in mean_vals.items()
    }


@contextlib.contextmanager
def trace_profile(log_dir: str):
    """``with trace_profile(dir):`` wraps a region in a jax profiler trace."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
