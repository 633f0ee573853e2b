"""Utils subsystem tests: metrics, timers, logging."""
import json
import logging

import jax.numpy as jnp
import numpy as np

from gomel_tpu.utils import (StageTimer, ThroughputResult, get_logger,
                             log_event, measure_throughput,
                             scaling_efficiency)


def test_measure_throughput_counts():
    import jax
    f = jax.jit(lambda x: x * 2.0)
    res = measure_throughput(f, (jnp.ones(1000),), audio_seconds_per_call=2.0,
                             min_seconds=0.05)
    assert res.iters >= 3
    assert res.audio_seconds == 2.0 * res.iters
    assert res.audio_seconds_per_second > 0
    d = res.json()
    assert set(d) == {"audio_seconds_per_second", "per_chip", "iters",
                      "n_devices", "wall_seconds"}


def test_scaling_efficiency():
    a = ThroughputResult(audio_seconds=100, wall_seconds=1.0, iters=1,
                         n_devices=1)
    b = ThroughputResult(audio_seconds=720, wall_seconds=1.0, iters=1,
                         n_devices=8)
    assert scaling_efficiency(a, b) == 0.9


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    rep = t.report()
    assert rep["a"]["count"] == 2
    assert rep["b"]["count"] == 1
    assert rep["a"]["total_s"] >= 0


def test_logger_json_mode(capsys):
    logger = get_logger()
    assert logger.name == "gomel_tpu"
    log_event("test_event", foo=1)
    # second call reuses handlers
    assert get_logger() is logger


def test_save_wav_rejects_nonfinite(tmp_path):
    import pytest
    from gomel_tpu.io.audio import save_wav
    bad = np.zeros(100)
    bad[50] = np.nan
    with pytest.raises(ValueError, match="NaN/Inf"):
        save_wav(str(tmp_path / "bad.wav"), bad, 16000)
    bad[50] = np.inf
    with pytest.raises(ValueError, match="NaN/Inf"):
        save_wav(str(tmp_path / "bad2.wav"), bad, 16000)


def test_device_trace_writes_profile(tmp_path):
    import os
    import jax.numpy as jnp
    from gomel_tpu.utils.profiling import annotate, device_trace
    logdir = str(tmp_path / "trace")
    with device_trace(logdir):
        with annotate("test_region"):
            jnp.ones(128).sum().block_until_ready()
    found = []
    for root, _, names in os.walk(logdir):
        found.extend(names)
    assert found  # a trace artifact was written
