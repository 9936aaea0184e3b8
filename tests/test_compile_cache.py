"""Compile-cache artifact seeding (cold-start fix, VERDICT r5 #5)."""
import tarfile

import ampis_tpu.utils.compile_cache as cc


def _make_artifact(tmp_path, name, files):
    art_dir = tmp_path / "artifacts"
    art_dir.mkdir(exist_ok=True)
    src = tmp_path / "src"
    src.mkdir(exist_ok=True)
    tar = art_dir / f"{name}.tar.gz"
    with tarfile.open(tar, "w:gz") as tf:
        for fname, content in files.items():
            p = src / fname
            p.write_bytes(content)
            tf.add(p, arcname=fname)
    return art_dir


def test_seed_unpacks_and_is_idempotent(tmp_path, monkeypatch):
    art_dir = _make_artifact(tmp_path, "v5e-test",
                             {"jit_f-abc-cache": b"entry-one",
                              "jit_g-def-cache": b"entry-two"})
    monkeypatch.setattr(cc, "_ARTIFACT_DIR", art_dir)
    cache = tmp_path / "cache"
    cache.mkdir()
    cc.seed_cache_from_artifacts(cache)
    assert (cache / "jit_f-abc-cache").read_bytes() == b"entry-one"
    assert (cache / "jit_g-def-cache").read_bytes() == b"entry-two"
    assert (cache / ".seeded-v5e-test.tar").exists()

    # an existing (possibly newer) entry is never overwritten
    (cache / "jit_f-abc-cache").write_bytes(b"local")
    (cache / ".seeded-v5e-test.tar").unlink()
    cc.seed_cache_from_artifacts(cache)
    assert (cache / "jit_f-abc-cache").read_bytes() == b"local"

    # the stamp short-circuits re-unpacking entirely
    (cache / "jit_g-def-cache").unlink()
    cc.seed_cache_from_artifacts(cache)
    assert not (cache / "jit_g-def-cache").exists()


def test_seed_handles_missing_artifact_dir(tmp_path, monkeypatch):
    monkeypatch.setattr(cc, "_ARTIFACT_DIR", tmp_path / "nope")
    cache = tmp_path / "cache"
    cache.mkdir()
    cc.seed_cache_from_artifacts(cache)  # no-op, no raise
    assert list(cache.iterdir()) == []
