"""Aggregate a jax.profiler trace by HLO category and top ops.

Usage: python tools/analyze_trace.py <logdir> [--iters N] [--top K]

Reads plugins/profile/*/*.trace.json.gz and prints (a) device time by
hlo_category, (b) the top ops with their HLO signatures, bytes accessed,
and achieved HBM bandwidth — enough to tell MXU-bound from bandwidth-bound
from issue-bound without the server-side HLO dump (unavailable through the
tunneled TPU backend).
"""
import argparse
import glob
import gzip
import json
import re
from collections import defaultdict

HBM_GBPS = 819.0  # v5e


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--like", default=None,
                    help="only ops whose long_name matches this regex")
    args = ap.parse_args()

    events = []
    for t in glob.glob(f"{args.logdir}/plugins/profile/*/*.trace.json.gz"):
        with gzip.open(t, "rt") as f:
            events.extend(json.load(f).get("traceEvents", []))

    pid_names = {e["pid"]: e["args"]["name"] for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower()}

    by_cat = defaultdict(float)
    by_op = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        a = e.get("args", {})
        cat = a.get("hlo_category", "?")
        if cat == "?" and "long_name" not in a:
            continue  # parent span
        ln = a.get("long_name", e.get("name", "?"))
        if args.like and not re.search(args.like, ln):
            continue
        dur = e.get("dur", 0) / 1e3
        by_cat[cat] += dur
        o = by_op.setdefault(e["name"], dict(ms=0.0, bytes=0, n=0, ln=ln,
                                             cat=cat))
        o["ms"] += dur
        o["bytes"] += int(a.get("bytes_accessed", 0))
        o["n"] += 1

    total = sum(by_cat.values())
    print(f"# device-op total {total / args.iters:.1f} ms/iter")
    for cat, ms in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{ms / args.iters:9.3f} ms/iter {100 * ms / total:5.1f}%  "
              f"{cat}")
    print()
    for name, o in sorted(by_op.items(), key=lambda kv: -kv[1]["ms"])[
            :args.top]:
        ms = o["ms"] / args.iters
        gbps = (o["bytes"] / args.iters / 1e9) / (ms / 1e3) if ms else 0
        sig = re.sub(r"\{[^}]*\}", "", o["ln"])[:150]
        print(f"{ms:8.3f} ms {gbps:6.0f} GB/s x{o['n'] // args.iters:<3d} "
              f"[{o['cat'][:12]:12s}] {sig}")


if __name__ == "__main__":
    main()
