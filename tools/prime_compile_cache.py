#!/usr/bin/env python
"""Record the flagship configs' XLA compile-cache entries as a shippable
artifact (cold-start fix, VERDICT r5 #5).

Runs the flagship inference benchmark (and optionally extra commands)
with a FRESH compile-cache directory so the resulting entries are
exactly the flagship programs, then packs them into
artifacts/compile_cache/<tag>.tar.gz. enable_persistent_cache unpacks
every shipped artifact on first use, so a fresh machine of the same
platform + jaxlib goes from ~16 min of compiles to seconds.

Usage (on the target platform, e.g. the v5e chip):
  python tools/prime_compile_cache.py            # flagship bench config
  python tools/prime_compile_cache.py --tag v5e-bench
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tarfile
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default=None,
                    help="artifact name (default: <platform>-<jaxlib>)")
    ap.add_argument("--cmd", action="append", default=None,
                    help="command(s) to run under the fresh cache "
                         "(default: the flagship bench, 1 iter)")
    args = ap.parse_args()

    fresh = Path(tempfile.mkdtemp(prefix="prime_cache_"))
    env = dict(os.environ)
    env["AMPIS_TPU_COMPILE_CACHE_DIR"] = str(fresh)
    # keep the fresh dir truly fresh: no artifact seeding, so the packed
    # entries are exactly this run's programs
    env["AMPIS_TPU_NO_CACHE_SEED"] = "1"
    cmds = args.cmd or [
        f"{sys.executable} bench.py",
    ]
    if args.cmd is None:
        env.setdefault("BENCH_ITERS", "1")
        env.setdefault("BENCH_WARMUP", "0")
    for cmd in cmds:
        print(f"priming: {cmd}")
        subprocess.run(cmd, shell=True, cwd=REPO, env=env, check=True)

    entries = [p for p in fresh.iterdir()
               if p.is_file() and not p.name.startswith(".seeded-")]
    if not entries:
        sys.exit("no cache entries were produced — nothing to pack")

    import json

    import jax
    import jaxlib
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", dev.platform)
    if args.tag:
        tag = args.tag
    else:
        tag = f"{kind}-{jaxlib.__version__}".replace(" ", "-").lower()
    # platform metadata gates seed-time unpacking (XLA:CPU executables
    # are host-feature-specific — ampis_tpu.utils.compile_cache)
    meta = {"platform": jax.default_backend(), "device_kind": kind,
            "jaxlib": jaxlib.__version__}
    if meta["platform"] == "cpu":
        sys.path.insert(0, str(REPO))
        from ampis_tpu.utils.compile_cache import host_cpu_fingerprint
        meta["cpu_fingerprint"] = host_cpu_fingerprint()
    meta_path = fresh / "CACHE_META.json"
    meta_path.write_text(json.dumps(meta))
    out = REPO / "artifacts" / "compile_cache" / f"{tag}.tar.gz"
    out.parent.mkdir(parents=True, exist_ok=True)
    with tarfile.open(out, "w:gz") as tf:
        tf.add(meta_path, arcname="CACHE_META.json")
        for p in sorted(entries):
            tf.add(p, arcname=p.name)
    total = sum(p.stat().st_size for p in entries)
    print(f"packed {len(entries)} entries ({total >> 20} MB raw) -> {out} "
          f"({out.stat().st_size >> 20} MB)")


if __name__ == "__main__":
    main()
