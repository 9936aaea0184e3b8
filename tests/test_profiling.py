"""Profiler hook / trace context produce device traces (SURVEY.md §5)."""
import glob

from ampis_tpu.engine.profiling import ProfilerHook, trace


def test_trace_context(tmp_path):
    import jax.numpy as jnp

    with trace(tmp_path / "t"):
        (jnp.ones((128, 128)) @ jnp.ones((128, 128))).block_until_ready()
    assert glob.glob(str(tmp_path / "t" / "plugins" / "profile" / "*"))


def test_profiler_hook_window(tmp_path):
    class FakeTrainer:
        iter = 0
        params = ()

    hook = ProfilerHook(tmp_path / "h", start=2, stop=4)
    hook.trainer = FakeTrainer()
    for it in range(6):
        hook.trainer.iter = it
        hook.after_step()
    assert not hook._active
    assert glob.glob(str(tmp_path / "h" / "plugins" / "profile" / "*"))
