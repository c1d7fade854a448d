"""Structured logging + per-phase timing instrumentation.

The reference has a print-stub `Logger` ("easily extended to ROS logging",
`ft_mpc/util/controller_debug.py:262-273`) and wall-clock prints around the
solver (`spiraling_mpc.py:88,233,320,351-352`).  This module provides:

  * `Logger`: stdlib-logging-backed with the same .info/.warn surface.
  * `PhaseTimer`: context-manager wall-clock phases (host-side; device work
    is measured by blocking at phase exit).
  * `trace_annotation`: jax.profiler named scopes for device-side phases so
    linearize/condense/solve/allocate show up in TPU profiler traces.
"""

from __future__ import annotations

import contextlib
import logging
import time

import jax


class Logger:
    """Reference-compatible logger surface backed by `logging`."""

    def __init__(self, name: str = "ft_mpc_tpu", level: int = logging.INFO):
        self._log = logging.getLogger(name)
        if not self._log.handlers:
            h = logging.StreamHandler()
            h.setFormatter(logging.Formatter("%(asctime)s %(name)s %(message)s"))
            self._log.addHandler(h)
        self._log.setLevel(level)

    def info(self, msg: str) -> None:
        self._log.info(msg)

    def warn(self, msg: str) -> None:
        self._log.warning(msg)


class PhaseTimer:
    """Accumulating wall-clock phase timer.

    with timer.phase("solve"):  ...   -- blocks on device work at exit so
    the measured time covers execution, not just dispatch.
    """

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name, tot in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:24s} {tot*1e3:10.2f} ms total  x{n}  "
                         f"({tot/n*1e3:.2f} ms/call)")
        return "\n".join(lines)


def trace_annotation(name: str):
    """Named profiler scope (shows up in jax.profiler TPU traces)."""
    return jax.profiler.TraceAnnotation(name)
