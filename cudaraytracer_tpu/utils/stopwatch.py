"""Wall-clock stopwatch — portable replacement for the Windows
QueryPerformanceCounter StopWatch (swatch.h/swatch.cpp).

Same API shape: Reset / Start / Stop with *accumulating* Stop
(swatch.cpp:22-29 adds each Start..Stop span), GetTime in seconds.

``section`` is a convenience context manager; for device work it calls
``block_until_ready`` on the supplied value so timings include TPU execution,
the analog of the cudaDeviceSynchronize bracketing in render.h:223-225.
"""

from __future__ import annotations

import time
from contextlib import contextmanager


class StopWatch:
    def __init__(self):
        self._accum = 0.0
        self._start = None

    def Reset(self) -> None:
        self._accum = 0.0
        self._start = None

    def Start(self) -> None:
        self._start = time.perf_counter()

    def Stop(self) -> None:
        if self._start is not None:
            self._accum += time.perf_counter() - self._start
            self._start = None

    def GetTime(self) -> float:
        return self._accum

    # pythonic aliases
    reset, start, stop, seconds = Reset, Start, Stop, GetTime


@contextmanager
def section(watch: StopWatch):
    watch.Start()
    try:
        yield watch
    finally:
        watch.Stop()


def sync(x):
    """Block until device values are ready (cudaDeviceSynchronize analog)."""
    try:
        import jax
        jax.block_until_ready(x)
    except Exception:
        pass
    return x
