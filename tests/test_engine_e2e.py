"""Subprocess-driven end-to-end engine test (SURVEY.md §4 item d).

Runs tests/e2e_train_predict.py in a fresh interpreter with a clean
single-device CPU config: trains 2 iterations with the LossEvalHook,
checkpoints, reloads through DefaultPredictor, and compresses predictions —
the reference's notebook workflow end to end on a synthetic dataset.
"""
import os
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

SCRIPT = Path(__file__).parent / "e2e_train_predict.py"


def test_train_checkpoint_predict_roundtrip():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, str(SCRIPT)], env=env, capture_output=True,
        text=True, timeout=2900)
    assert proc.returncode == 0, (
        f"stdout:\n{proc.stdout[-3000:]}\nstderr:\n{proc.stderr[-3000:]}")
    assert "TRAIN_OK" in proc.stdout
    assert "PREDICT_OK" in proc.stdout
    assert "E2E_OK" in proc.stdout
