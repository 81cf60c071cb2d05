"""Per-frame metrics CSV matching the reference schema.

The reference writes output.csv with header ``frame,rendering,update,build``
(kernel.cu:61,101; CSVWriter.h:8-32): one build-time-only row up front
(kernel.cu:38) then one row per frame with render/update times
(render.h:230).  ``MetricsLog`` reproduces that exactly and adds a JSON dump
for machine consumption.
"""

from __future__ import annotations

import json
from typing import List

HEADER = ["frame", "rendering", "update", "build"]


class MetricsLog:
    def __init__(self):
        self.rows: List[List[str]] = [list(HEADER)]

    def log_build(self, seconds: float) -> None:
        """kernel.cu:38 — initial row carrying only the BVH build time."""
        self.rows.append(["", "", "", str(seconds)])

    def log_frame(self, frame: int, rendering: float, update: float) -> None:
        """render.h:230 — data.push_back({frame, renderTime, updateTime, ""})."""
        self.rows.append([str(frame), str(rendering), str(update), ""])

    @classmethod
    def read_csv(cls, path: str) -> "MetricsLog":
        """Load a previously-written CSV (for --resume row preservation)."""
        log = cls()
        log.rows = [list(HEADER)]
        with open(path) as f:
            rows = [line.rstrip("\n").split(",") for line in f
                    if line.strip()]
        if rows and rows[0] == HEADER:
            rows = rows[1:]
        log.rows.extend(rows)
        return log

    def write_csv(self, path: str) -> None:
        """CSVWriter.h:8-32 writeCSV."""
        with open(path, "w") as f:
            for row in self.rows:
                f.write(",".join(row) + "\n")

    def write_json(self, path: str) -> None:
        out = []
        for row in self.rows[1:]:
            out.append(dict(zip(HEADER, row)))
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
