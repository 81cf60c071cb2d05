"""Checkpoint / resume for long renders and fits.

The reference has none (SURVEY.md §5: any CUDA error exits; the closest analog
is per-frame PNGs + manual beginFrame/endFrame).  Here:

  * fit checkpoints: params + optimizer step saved as NPZ; ``fit`` jobs can
    resume mid-optimization.
  * animation resume: ``next_frame`` scans the output directory for existing
    picture_<n>.png frames (the reference's manual-resume pattern,
    kernel.cu:50-51, made automatic).

Atomic writes (tmp + rename) so an interrupt never leaves a torn checkpoint.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np


def save_params(path: str, params: Dict[str, Any], step: int,
                extra: Optional[Dict[str, Any]] = None) -> None:
    """Atomically save a pytree-of-arrays checkpoint."""
    flat = {}
    for k, v in params.items():
        if isinstance(v, tuple):
            for i, vi in enumerate(v):
                flat[f"{k}.{i}"] = np.asarray(vi)
        else:
            flat[k] = np.asarray(v)
    meta = {"step": int(step), "keys": list(params.keys()),
            "extra": extra or {}}
    tmp = path + ".tmp"
    np.savez(tmp, __meta__=json.dumps(meta), **flat)
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load_params(path: str) -> Tuple[Dict[str, Any], int, Dict[str, Any]]:
    """Load (params, step, extra); raises FileNotFoundError if absent."""
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))
        params: Dict[str, Any] = {}
        for k in meta["keys"]:
            if k in z:
                params[k] = z[k]
            else:  # tuple-valued entry
                parts = sorted((n for n in z.files if n.startswith(k + ".")),
                               key=lambda n: int(n.rsplit(".", 1)[1]))
                params[k] = tuple(z[p] for p in parts)
    return params, meta["step"], meta.get("extra", {})


def next_frame(out_dir: str, begin_frame: int = 0) -> int:
    """First frame index without an existing picture_<n>.png (resume point)."""
    if not os.path.isdir(out_dir):
        return begin_frame
    have = set()
    for name in os.listdir(out_dir):
        m = re.fullmatch(r"picture_(\d+)\.png", name)
        if m:
            have.add(int(m.group(1)))
    f = begin_frame
    while f in have:
        f += 1
    return f
