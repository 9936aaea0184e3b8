"""Profiling utilities: device traces + per-step timing.

The reference's only tracing machinery is wall-clock ETA logging inside
its validation hook (reference data_utils.py:70-94) plus detectron2's
EventStorage iteration timing [dep]. The TPU-native equivalents
(SURVEY.md §5 "Tracing / profiling"):

* per-step wall time already lands in EventStorage as the ``time``
  scalar every iteration;
* ProfilerHook captures a jax.profiler device trace (XLA op timeline,
  viewable in XProf/TensorBoard or parseable from the
  ``*.trace.json.gz``) for a window of training steps;
* ``trace`` wraps any callable in a one-shot profiler capture for
  inference paths.
"""
from __future__ import annotations

import contextlib
import time
from pathlib import Path

import jax


class ProfilerHook:
    """Trainer hook: capture a device trace for steps [start, stop).

    Register with ``trainer.register_hook(ProfilerHook(out_dir))``.
    Captures after the warmup/compile iterations by default so the trace
    shows steady-state step composition.
    """

    def __init__(self, output_dir, start=10, stop=13):
        self._dir = str(output_dir)
        self._start = start
        self._span = max(stop - start, 1)
        self._active = False
        self._done = False
        self._started_at = None
        self.trainer = None  # set by trainer on registration

    def after_step(self):
        it = self.trainer.iter
        if not self._active and not self._done and it + 1 >= self._start:
            # >=: a resumed run already past `start` still captures a
            # window of `stop - start` steps
            jax.profiler.start_trace(self._dir)
            self._active = True
            self._started_at = it + 1
        elif self._active and it + 1 >= self._started_at + self._span:
            self._stop_trace()

    def after_train(self):
        # training may end inside (or before completing) the window:
        # never leave the process-global profiler running
        if self._active:
            self._stop_trace()

    def _stop_trace(self):
        jax.block_until_ready(self.trainer.params)
        jax.profiler.stop_trace()
        self._active = False
        self._done = True
        print(f"profiler: wrote device trace starting at iter "
              f"{self._started_at} to {self._dir}")


@contextlib.contextmanager
def trace(output_dir):
    """Capture a device trace around a block of device work.

    >>> with trace('/tmp/trace'):
    ...     out = predictor(img)
    """
    Path(output_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(output_dir))
    t0 = time.time()
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print(f"profiler: device trace ({time.time() - t0:.2f}s window) "
              f"-> {output_dir}")
