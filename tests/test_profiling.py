"""Profiler hook / trace context produce device traces (SURVEY.md §5)."""
import glob

from ampis_tpu.engine.profiling import ProfilerHook, trace


def test_trace_context(tmp_path):
    import jax.numpy as jnp

    with trace(tmp_path / "t"):
        (jnp.ones((128, 128)) @ jnp.ones((128, 128))).block_until_ready()
    assert glob.glob(str(tmp_path / "t" / "plugins" / "profile" / "*"))


class _FakeTrainer:
    iter = 0
    params = ()


def test_profiler_hook_window(tmp_path):
    hook = ProfilerHook(tmp_path / "h", start=2, stop=4)
    hook.trainer = _FakeTrainer()
    for it in range(6):
        hook.trainer.iter = it
        hook.after_step()
    assert not hook._active
    assert glob.glob(str(tmp_path / "h" / "plugins" / "profile" / "*"))


def test_profiler_hook_stops_when_training_ends_mid_window(tmp_path):
    hook = ProfilerHook(tmp_path / "m", start=1, stop=100)
    hook.trainer = _FakeTrainer()
    for it in range(3):  # ends long before the window closes
        hook.trainer.iter = it
        hook.after_step()
    assert hook._active
    hook.after_train()
    assert not hook._active
    assert glob.glob(str(tmp_path / "m" / "plugins" / "profile" / "*"))


def test_profiler_hook_resumed_run_still_captures(tmp_path):
    hook = ProfilerHook(tmp_path / "r", start=10, stop=12)
    hook.trainer = _FakeTrainer()
    for it in range(50, 55):  # resumed run already past `start`
        hook.trainer.iter = it
        hook.after_step()
    hook.after_train()
    assert glob.glob(str(tmp_path / "r" / "plugins" / "profile" / "*"))
