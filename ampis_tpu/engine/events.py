"""Event storage: training scalars, logging, and JSON metrics output.

Replaces detectron2's EventStorage/writers that the reference's
LossEvalHook writes into (reference data_utils.py:104-106; SURVEY.md §5
metrics/logging). Scalars accumulate in memory, stream to metrics.json
(one JSON object per line), and print periodically.
"""
from __future__ import annotations

import json
import time
from collections import defaultdict
from pathlib import Path


class EventStorage:
    def __init__(self, output_dir=None, log_period=20, start_iter=0):
        self._history = defaultdict(list)
        self._latest = {}
        self.iter = start_iter
        self.log_period = log_period
        self._file = None
        if output_dir is not None:
            Path(output_dir).mkdir(parents=True, exist_ok=True)
            self._file = open(Path(output_dir) / "metrics.json", "a")
        self._t0 = time.time()

    def put_scalar(self, name, value):
        value = float(value)
        self._history[name].append((self.iter, value))
        self._latest[name] = value

    def put_scalars(self, **kwargs):
        for k, v in kwargs.items():
            self.put_scalar(k, v)

    def history(self, name):
        return self._history[name]

    def latest(self):
        return dict(self._latest)

    def step(self):
        self.iter += 1

    def write_record(self, iteration, scalars):
        """Append one metrics.json line (no console output, no flush).

        The trainer calls this once per iteration when it materializes a
        log period's deferred scalars, so metrics.json keeps the full
        per-iteration record even though device fetches are batched.
        """
        if self._file is not None:
            self._file.write(json.dumps(
                {"iteration": int(iteration), **scalars}) + "\n")

    def write(self):
        """Flush the metrics file and print the latest scalars.

        The caller controls the cadence (the trainer calls this once per
        log period, right after materializing that period's scalars —
        every console print carries fresh values).
        """
        if self._file is not None:
            self._file.flush()
        elapsed = time.time() - self._t0
        parts = [f"iter: {self.iter}"]
        for k, v in sorted(self._latest.items()):
            parts.append(f"{k}: {v:.4g}")
        parts.append(f"elapsed: {elapsed:.0f}s")
        print("  ".join(parts), flush=True)

    def close(self):
        if self._file is not None:
            self._file.close()
            self._file = None
