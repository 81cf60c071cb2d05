"""utils/recovery.py — failure detection + elastic retry semantics.

The reference aborts on any device error (kernel.cu:24-27 checkCudaErrors);
this subsystem is net-new.  Tests drive the classifier and the retry ladder
with injected failures and a fake sleep (no real device crash needed).
"""

import pytest

from cudaraytracer_tpu.utils.recovery import (RetriesExhausted,
                                              is_transient_device_error,
                                              retry_transient)


def test_classifier():
    assert is_transient_device_error(
        RuntimeError("INTERNAL: TPU worker process crashed"))
    assert is_transient_device_error(
        RuntimeError("UNAVAILABLE: socket closed before response"))
    assert is_transient_device_error(ConnectionResetError("connection reset"))
    # programming errors are NOT transient
    assert not is_transient_device_error(
        TypeError("unsupported operand type"))
    assert not is_transient_device_error(
        ValueError("TPU worker process crashed"))   # wrong type
    assert not is_transient_device_error(
        RuntimeError("Incompatible shapes for broadcasting"))


def test_retry_succeeds_after_transient_failures():
    calls = {"n": 0}
    retried = []
    slept = []

    def step():
        calls["n"] += 1
        if calls["n"] <= 2:
            raise RuntimeError("TPU worker process crashed")
        return "ok"

    out = retry_transient(step, retries=3, backoff_s=1.0, backoff_mult=3.0,
                          on_retry=lambda a, e: retried.append(a),
                          sleep=slept.append)
    assert out == "ok"
    assert calls["n"] == 3
    assert retried == [1, 2]
    assert slept == [1.0, 3.0]          # exponential ladder


def test_non_transient_raises_immediately():
    calls = {"n": 0}

    def step():
        calls["n"] += 1
        raise ValueError("bad shape")

    with pytest.raises(ValueError):
        retry_transient(step, retries=5, sleep=lambda s: None)
    assert calls["n"] == 1


def test_retries_exhausted():
    calls = {"n": 0}

    def step():
        calls["n"] += 1
        raise RuntimeError("TPU worker process crashed")

    with pytest.raises(RetriesExhausted) as ei:
        retry_transient(step, retries=2, sleep=lambda s: None)
    assert calls["n"] == 3
    assert ei.value.attempts == 3
    assert isinstance(ei.value.__cause__, RuntimeError)


def test_zero_retries_raises_original():
    with pytest.raises(RuntimeError, match="crashed"):
        retry_transient(
            lambda: (_ for _ in ()).throw(
                RuntimeError("TPU worker process crashed")),
            retries=0, sleep=lambda s: None)
