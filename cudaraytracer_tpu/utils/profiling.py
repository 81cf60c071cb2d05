"""Profiling / tracing — TPU-native replacement for the StopWatch-only
instrumentation of the reference (swatch.h + output.csv, SURVEY.md §5).

Two layers:
  * section timers (SectionTimer) — wall-clock spans with device sync,
    aggregated min/mean/max; the structured version of the reference's
    ad-hoc Reset/Start/Stop brackets.
  * jax.profiler integration — `trace()` captures a full XLA/TPU trace
    viewable in TensorBoard/Perfetto (replaces "no GPU-side profiling" in the
    reference with the real thing).
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, List


class SectionTimer:
    def __init__(self):
        self.spans: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def section(self, name: str, sync_value=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_value is not None:
                try:
                    # scalar fetch, not block_until_ready: the TPU backend
                    # can return from block_until_ready before execution
                    # finishes (CLAUDE.md)
                    import jax
                    import jax.numpy as jnp
                    leaf = jax.tree.leaves(sync_value)[0]
                    float(jnp.sum(jnp.asarray(leaf, jnp.float32)))
                except Exception:
                    pass
            self.spans[name].append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, ts in self.spans.items():
            out[name] = {
                "count": len(ts),
                "total": sum(ts),
                "mean": sum(ts) / len(ts),
                "min": min(ts),
                "max": max(ts),
            }
        return out

    def report(self) -> str:
        lines = []
        for name, s in sorted(self.summary().items(),
                              key=lambda kv: -kv[1]["total"]):
            lines.append(f"{name:30s} n={s['count']:4d} total={s['total']:8.3f}s "
                         f"mean={s['mean'] * 1e3:8.2f}ms")
        return "\n".join(lines)

    def write_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/crt_trace"):
    """Capture a jax.profiler trace around the block (TensorBoard-viewable)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace span for device work (shows up inside the XLA trace)."""
    import jax
    return jax.profiler.TraceAnnotation(name)
