"""Batch sweep of the mel encode AFTER the extended-weight tail adoption.

The round-2 sweep fixed batch 2 as the serving shape: larger batches
spilled the [F, N] / [F, N/2, 2] intermediates from VMEM to HBM (1.6x per
row). The extended-weight tail (exp_mel_tail.py) removed the biggest
post-FFT copy ([B, F, N/2, 2] channel stack), so the optimum could have
moved — re-measure throughput per audio-second across batch sizes with
the shipped ``mel_encode_batch``.

Run on the chip:  timeout 580 python benchmarks/exp_batch_sweep2.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import pipelined_time


def main():
    from gomel_tpu.core.config import MelConfig
    from gomel_tpu.core.filterbank import mel_weights
    from gomel_tpu.core.framing import pad_length
    from gomel_tpu.ops.mel_ops import mel_encode_batch
    from gomel_tpu.ops.stft import hann_window

    cfg = MelConfig.cli_default()
    sr, secs = 48000, 30.0
    n = pad_length(int(sr * secs), cfg.window)
    dev = jax.devices()[0]

    fwd = jnp.asarray(
        mel_weights(cfg.n_bins, cfg.num_mels, cfg.mel_fmin, cfg.mel_fmax),
        jnp.float32)
    window = jnp.asarray(hann_window(cfg.resolut), jnp.float32)
    rng = np.random.default_rng(0)

    rates = {}
    for batch in (1, 2, 3, 4, 6, 8):
        enc = jax.jit(lambda x: mel_encode_batch(
            x, cfg.num_mels, cfg.resolut, cfg.window, fwd, window))
        xs = [jax.device_put(jnp.asarray(
            rng.standard_normal((batch, n)), jnp.float32), dev)
            for _ in range(2)]
        audio_s = batch * n / sr
        per = pipelined_time(enc, [(x,) for x in xs], 4, 16)
        rates[batch] = audio_s / per
        print(f"batch {batch}: {rates[batch]:,.0f} a-s/s "
              f"({per * 1e3:.2f} ms/call)")
    best = max(rates, key=rates.get)
    print(f"\nbest: batch {best} at {rates[best]:,.0f} a-s/s")


if __name__ == "__main__":
    main()
