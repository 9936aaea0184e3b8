"""2-process data-parallel training step over a local coordinator.

SURVEY.md §5 distributed row: the same mesh code must span hosts (DCN on
real slices). Two subprocesses with 4 virtual CPU devices each join via
jax.distributed.initialize into one 8-device mesh; both run one sharded
loss+grad step of the full Mask R-CNN and must report the identical
all-reduced loss and gradient norm.
"""
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = Path(__file__).parent / "multihost_dp_worker.py"

pytestmark = pytest.mark.slow


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_dp_step():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(port), str(i), "2"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"stdout:\n{out[-2000:]}\nstderr:\n{err[-4000:]}"
        outs.append(out)

    lines = [next(ln for ln in o.splitlines()
                  if ln.startswith("MULTIHOST_LOSS")) for o in outs]
    # all-reduce makes loss and grad norm globally identical
    assert lines[0] == lines[1], lines
