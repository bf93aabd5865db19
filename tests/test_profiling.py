"""Profiling utilities: StepTimer summary + jax.profiler trace capture."""
import glob
import os

import jax.numpy as jnp

from ealdm_tpu.utils.profiling import StepTimer, fence, trace


def test_step_timer_sections_and_summary():
    t = StepTimer()
    for _ in range(3):
        with t.section("step"):
            pass
    t.start("data")
    t.stop("data")
    t.stop("never-started")  # no-op
    s = t.summary()
    assert "step" in s and "data" in s and "calls" in s
    assert "3" in s  # step call count
    t.report()  # prints, must not raise


def test_fence_reads_back_scalar():
    x = jnp.arange(6.0).reshape(2, 3) + 1.0
    assert fence(x) == 1.0


def test_trace_writes_xplane(tmp_path):
    with trace(str(tmp_path)):
        _ = jnp.dot(jnp.ones((64, 64)), jnp.ones((64, 64))).block_until_ready()
    files = glob.glob(
        os.path.join(str(tmp_path), "plugins", "profile", "*", "*.xplane.pb")
    )
    assert files, "no xplane trace written"
