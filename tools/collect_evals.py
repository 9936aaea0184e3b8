"""Collect tools/ap_table.py results from runs/logs/eval_*.log.

Each ap_table run ends with one JSON line:
  {"ckpt": ..., "dataset": ..., "mask_cap": ..., "rows": {key: {...}}}
This prints a markdown-ready summary of every completed eval log, so the
docs/parity.md update after a long eval queue is one read instead of
twenty log spelunks.

Usage: python tools/collect_evals.py [logdir]
"""
import json
import sys
from pathlib import Path


def last_json(path):
    out = None
    for line in path.read_text(errors="replace").splitlines():
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "rows" in d:
                out = d
    return out


def main():
    logdir = Path(sys.argv[1] if len(sys.argv) > 1 else "runs/logs")
    logs = sorted(logdir.glob("eval_*.log"))
    if not logs:
        print(f"no eval_*.log under {logdir}")
        return
    for p in logs:
        d = last_json(p)
        if d is None:
            tail = p.read_text(errors="replace").strip().splitlines()
            status = tail[-1][:100] if tail else "(empty)"
            print(f"## {p.name}: INCOMPLETE — {status}")
            continue
        print(f"## {p.name}  ckpt={d['ckpt']}  dataset={d['dataset']}"
              + (f"  mask_cap={d['mask_cap']}" if d.get("mask_cap") else ""))
        for key, row in d["rows"].items():
            if isinstance(row, dict):
                cells = "  ".join(f"{k}={v:.3f}" if isinstance(v, float)
                                  else f"{k}={v}" for k, v in row.items())
            else:
                cells = str(row)
            print(f"  {key}: {cells}")


if __name__ == "__main__":
    main()
