"""Persistent XLA compilation cache.

First compile of the full Mask R-CNN program through the tunneled TPU
costs 150-1500 s (compile RPC + tunnel); a persistent on-disk cache cuts
repeat runs to seconds. Enabled by every engine entry point (Trainer,
DefaultPredictor, bench.py, __graft_entry__) — idempotent and safe to
call multiple times.

Opt out with AMPIS_TPU_NO_COMPILE_CACHE=1; override the location with
AMPIS_TPU_COMPILE_CACHE_DIR.
"""
from __future__ import annotations

import os
from pathlib import Path

_DEFAULT_DIR = Path(__file__).resolve().parents[2] / "build" / "jax_cache"
_enabled = False


def enable_persistent_cache(cache_dir: str | os.PathLike | None = None):
    """Point jax at an on-disk compilation cache (idempotent)."""
    global _enabled
    if _enabled or os.environ.get("AMPIS_TPU_NO_COMPILE_CACHE"):
        return
    import jax

    path = Path(cache_dir or os.environ.get("AMPIS_TPU_COMPILE_CACHE_DIR",
                                            _DEFAULT_DIR))
    try:
        path.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
        # cache everything: the tunnel makes even mid-size compiles slow
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except (OSError, AttributeError):  # read-only fs / older jax: best effort
        return
    _enabled = True
