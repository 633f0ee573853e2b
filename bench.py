"""Headline benchmark: mel-extraction throughput (audio-seconds/s per chip).

Target (BASELINE.json north star): >= 10,000 audio-seconds/s per chip for
mel extraction at the reference CLI config (NumMels=192, Window=1280,
Resolut=4096, fmax=16k; /root/reference/cmd/tomel/main.go:24-31).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
Extra diagnostics go to stderr.
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_AUDIO_S_PER_S = 10_000.0


def main() -> None:
    from gomel_tpu.core.config import MelConfig
    from gomel_tpu.core.filterbank import mel_weights
    from gomel_tpu.core.framing import pad_length
    from gomel_tpu.ops.mel_ops import mel_encode
    from gomel_tpu.ops.stft import hann_window

    cfg = MelConfig.cli_default()
    sr = 48000
    secs = 30.0
    batch = 8

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)

    n = pad_length(int(sr * secs), cfg.window)
    audio_seconds_per_call = batch * n / sr

    fwd = jnp.asarray(
        mel_weights(cfg.n_bins, cfg.num_mels, cfg.mel_fmin, cfg.mel_fmax),
        dtype=jnp.float32)
    window = jnp.asarray(hann_window(cfg.resolut), dtype=jnp.float32)

    @jax.jit
    def step(xb):
        return jax.vmap(
            lambda x: mel_encode(x, cfg.num_mels, cfg.resolut, cfg.window,
                                 fwd, window))(xb)

    rng = np.random.default_rng(0)
    xb = jax.device_put(
        jnp.asarray(rng.standard_normal((batch, n)), dtype=jnp.float32), dev)

    # compile + warm up
    out = step(xb)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    jax.block_until_ready(step(xb))
    warm = time.perf_counter() - t0
    iters = max(3, min(30, int(2.0 / max(warm, 1e-4))))

    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(xb)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - t0

    value = audio_seconds_per_call * iters / elapsed
    print(f"iters={iters} elapsed={elapsed:.4f}s "
          f"audio_s/call={audio_seconds_per_call:.1f}", file=sys.stderr)
    print(json.dumps({
        "metric": "mel_extract_throughput",
        "value": round(value, 1),
        "unit": "audio-seconds/s per chip",
        "vs_baseline": round(value / BASELINE_AUDIO_S_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
