"""Profiling subsystem smoke tests."""

import os

from cambrian_tpu.profiling import PhaseTimer, annotate, trace


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("tower"):
        pass
    with t.phase("tower"):
        pass
    with t.phase("sva"):
        pass
    s = t.summary()
    assert s["tower"]["count"] == 2 and s["sva"]["count"] == 1
    assert "mean_ms" in s["tower"]
    t.reset()
    assert t.summary() == {}


def test_trace_writes_profile(tmp_path):
    import jax.numpy as jnp

    logdir = str(tmp_path / "trace")
    with trace(logdir):
        with annotate("compute"):
            (jnp.ones((32, 32)) @ jnp.ones((32, 32))).block_until_ready()
    # a plugins/profile dir with at least one capture must exist
    found = []
    for root, dirs, files in os.walk(logdir):
        found.extend(files)
    assert found, "no trace files written"
