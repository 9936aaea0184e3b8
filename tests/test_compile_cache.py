"""Compile-cache artifact seeding (cold-start fix, VERDICT r5 #5).

Round 8 adds the portability gate (VERDICT r4 weak #3): artifacts carry
platform metadata, and seeding skips artifacts recorded for a different
backend — or, for CPU, for a host with different machine features — so
a non-matching host recompiles cleanly instead of spewing XLA AOT
load-rejection warnings. Under pytest the backend is 'cpu' (conftest).
"""
import json
import tarfile

import jax

import ampis_tpu.utils.compile_cache as cc

BACKEND = jax.default_backend()   # 'cpu' under the test conftest


def _make_artifact(tmp_path, name, files, meta=None):
    art_dir = tmp_path / "artifacts"
    art_dir.mkdir(exist_ok=True)
    src = tmp_path / f"src_{name}"
    src.mkdir(exist_ok=True)
    tar = art_dir / f"{name}.tar.gz"
    if meta is not None:
        files = dict(files)
        files["CACHE_META.json"] = json.dumps(meta).encode()
    with tarfile.open(tar, "w:gz") as tf:
        for fname, content in files.items():
            p = src / fname
            p.write_bytes(content)
            tf.add(p, arcname=fname)
    return art_dir


def _cpu_meta():
    return {"platform": "cpu", "device_kind": "cpu",
            "cpu_fingerprint": cc.host_cpu_fingerprint()}


def test_seed_unpacks_and_is_idempotent(tmp_path, monkeypatch):
    art_dir = _make_artifact(tmp_path, "cpu-test",
                             {"jit_f-abc-cache": b"entry-one",
                              "jit_g-def-cache": b"entry-two"},
                             meta=_cpu_meta())
    monkeypatch.setattr(cc, "_ARTIFACT_DIR", art_dir)
    cache = tmp_path / "cache"
    cache.mkdir()
    cc.seed_cache_from_artifacts(cache)
    assert (cache / "jit_f-abc-cache").read_bytes() == b"entry-one"
    assert (cache / "jit_g-def-cache").read_bytes() == b"entry-two"
    # metadata member itself is not materialized into the cache
    assert not (cache / "CACHE_META.json").exists()
    stamp = cache / f".seeded-{BACKEND}-cpu-test.tar"
    assert stamp.exists()

    # an existing (possibly newer) entry is never overwritten
    (cache / "jit_f-abc-cache").write_bytes(b"local")
    stamp.unlink()
    cc.seed_cache_from_artifacts(cache)
    assert (cache / "jit_f-abc-cache").read_bytes() == b"local"

    # the stamp short-circuits re-unpacking entirely
    (cache / "jit_g-def-cache").unlink()
    cc.seed_cache_from_artifacts(cache)
    assert not (cache / "jit_g-def-cache").exists()


def test_seed_skips_other_platform(tmp_path, monkeypatch):
    """A TPU-recorded artifact must not unpack under the CPU backend."""
    art_dir = _make_artifact(
        tmp_path, "tpu-v5-lite-0.9.0", {"jit_f-abc-cache": b"tpu-bits"},
        meta={"platform": "tpu", "device_kind": "TPU v5 lite"})
    monkeypatch.setattr(cc, "_ARTIFACT_DIR", art_dir)
    cache = tmp_path / "cache"
    cache.mkdir()
    cc.seed_cache_from_artifacts(cache)
    assert not (cache / "jit_f-abc-cache").exists()
    # the skip decision is stamped per backend
    assert (cache / f".seeded-{BACKEND}-tpu-v5-lite-0.9.0.tar").exists()


def test_seed_skips_other_platform_legacy_name(tmp_path, monkeypatch):
    """Metadata-less artifacts fall back to the filename-prefix platform."""
    art_dir = _make_artifact(tmp_path, "tpu-v5-lite-legacy",
                             {"jit_f-abc-cache": b"tpu-bits"})
    monkeypatch.setattr(cc, "_ARTIFACT_DIR", art_dir)
    cache = tmp_path / "cache"
    cache.mkdir()
    cc.seed_cache_from_artifacts(cache)
    assert not (cache / "jit_f-abc-cache").exists()


def test_seed_skips_feature_mismatched_cpu_artifact(tmp_path, monkeypatch):
    """CPU artifacts from a host with different machine features are
    rejected (the SIGILL-warning failure mode this gate exists for);
    legacy CPU artifacts without a fingerprint are rejected too."""
    meta = _cpu_meta()
    meta["cpu_fingerprint"] = "0" * 16   # some other host
    art_dir = _make_artifact(tmp_path, "cpu-other-host",
                             {"jit_f-abc-cache": b"foreign"}, meta=meta)
    _make_artifact(tmp_path, "cpu-no-meta",
                   {"jit_g-def-cache": b"unknown-host"})
    monkeypatch.setattr(cc, "_ARTIFACT_DIR", art_dir)
    cache = tmp_path / "cache"
    cache.mkdir()
    cc.seed_cache_from_artifacts(cache)
    assert not (cache / "jit_f-abc-cache").exists()
    assert not (cache / "jit_g-def-cache").exists()


def test_cpu_fingerprint_stable():
    assert cc.host_cpu_fingerprint() == cc.host_cpu_fingerprint()
    assert len(cc.host_cpu_fingerprint()) == 16


def test_seed_handles_missing_artifact_dir(tmp_path, monkeypatch):
    monkeypatch.setattr(cc, "_ARTIFACT_DIR", tmp_path / "nope")
    cache = tmp_path / "cache"
    cache.mkdir()
    cc.seed_cache_from_artifacts(cache)  # no-op, no raise
    assert list(cache.iterdir()) == []
