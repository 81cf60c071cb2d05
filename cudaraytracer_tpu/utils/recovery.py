"""Failure detection + elastic recovery for long device jobs.

The reference has NO failure handling: checkCudaErrors aborts the process on
any CUDA error (/root/reference/CudaTest/src/kernel.cu:24-27 via
helper_cuda.h), so a mid-animation device fault loses the run.  On this TPU
stack the analogous hazard is real and observed: the remote TPU worker can
crash under large HBM workloads ("TPU worker process crashed") and recovers
on its own after ~1 minute.

``retry_transient`` is the elastic-recovery primitive: run a step, classify
raised errors as transient-device vs. programming errors, back off and retry
the transient ones a bounded number of times.  Combined with the atomic
per-frame PNGs + ``checkpoint.next_frame`` resume scan, a driver survives a
worker crash with at most one lost frame and no lost files.

Classification is by exception type + message, because jax surfaces device
loss as ``XlaRuntimeError`` (a subclass of RuntimeError grown at runtime)
with backend-specific text; anything matching ``TRANSIENT_PATTERNS`` is
retried, anything else (shape errors, tracer leaks, OOM on CPU) re-raises
immediately so bugs stay loud.
"""

from __future__ import annotations

import re
import time
from typing import Any, Callable, Optional

# Messages that indicate the DEVICE failed, not the program.  Sources:
# observed axon tunnel failures (CLAUDE.md), jax/pjrt error text.
TRANSIENT_PATTERNS = (
    r"TPU worker process crashed",
    r"worker .*(crashed|terminated|unavailable)",
    r"socket closed",
    r"connection (reset|refused|closed)",
    r"deadline exceeded",
    r"unavailable",
    r"INTERNAL: .*(halted|reset|unhealthy)",
    r"device or resource busy",
    r"failed to (connect|enqueue)",
)
_TRANSIENT_RE = re.compile("|".join(TRANSIENT_PATTERNS), re.IGNORECASE)


def is_transient_device_error(err: BaseException) -> bool:
    """True if ``err`` looks like a recoverable device/transport failure."""
    if not isinstance(err, (RuntimeError, OSError, ConnectionError)):
        return False
    return bool(_TRANSIENT_RE.search(str(err)))


class RetriesExhausted(RuntimeError):
    """Raised when a transient failure persists past the retry budget."""

    def __init__(self, attempts: int, last: BaseException):
        super().__init__(
            f"device still failing after {attempts} attempts: {last}")
        self.attempts = attempts
        self.last = last


def retry_transient(fn: Callable[[], Any], *, retries: int = 3,
                    backoff_s: float = 20.0, backoff_mult: float = 2.0,
                    classify: Callable[[BaseException], bool]
                    = is_transient_device_error,
                    on_retry: Optional[Callable[[int, BaseException], None]]
                    = None,
                    sleep: Callable[[float], None] = time.sleep) -> Any:
    """Run ``fn()``; on a transient device error, back off and retry.

    retries: additional attempts after the first (so up to retries+1 calls).
    backoff_s: sleep before the first retry; multiplied by ``backoff_mult``
    each further retry (the observed worker recovery time is ~60s, so the
    default 20/40/80s ladder crosses it by the second retry).
    on_retry(attempt, err) runs AFTER each backoff sleep (the device has had
    time to recover) — drivers log and RESTORE device state there.  A
    transient error raised by on_retry itself (e.g. re-uploading state to a
    still-dead worker) consumes retry budget and backs off again instead of
    escaping; non-transient errors propagate immediately.
    """
    delay = backoff_s
    attempt = 0
    while True:
        try:
            return fn()
        except BaseException as err:  # noqa: BLE001 — classify() filters
            if not classify(err):
                raise
            attempt += 1
            if attempt > retries:
                if attempt > 1:
                    raise RetriesExhausted(attempt, err) from err
                raise           # retries=0: surface the original error
            last = err
        while True:         # backoff, then restore; restore may itself fail
            sleep(delay)
            delay *= backoff_mult
            if on_retry is None:
                break
            try:
                on_retry(attempt, last)
                break
            except BaseException as err:  # noqa: BLE001
                if not classify(err):
                    raise
                attempt += 1
                if attempt > retries:
                    raise RetriesExhausted(attempt, err) from err
                last = err
