"""The tutorial notebook must stay runnable end-to-end.

Executes every code cell of notebooks/ampis_tpu_tutorial.ipynb in order
(TRAIN=False path: analysis against the reference's shipped prediction
pickles; the notebook is the rebuild's counterpart of the reference colab
tutorial, its de-facto integration test — SURVEY.md §4).
"""
import json
from pathlib import Path

import matplotlib
import pytest

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parents[1]
NOTEBOOK = REPO / "notebooks/ampis_tpu_tutorial.ipynb"


def test_tutorial_notebook_executes(reference_root, tmp_path, monkeypatch):
    matplotlib.use("Agg")
    monkeypatch.chdir(tmp_path)  # notebook writes outputs to cwd
    nb = json.loads(NOTEBOOK.read_text())
    src = "\n\n".join("".join(c["source"]) for c in nb["cells"]
                      if c["cell_type"] == "code")
    # the notebook lives in notebooks/ and adds its parent (the repo root)
    src = src.replace("str(pathlib.Path.cwd().parent)", repr(str(REPO)))
    ns = {}
    exec(compile(src, str(NOTEBOOK), "exec"), ns)
    assert ns["scores"]["det_precision"] == pytest.approx(0.995, abs=1e-3)
    assert ns["stats"]["n_satellites"] > 0
