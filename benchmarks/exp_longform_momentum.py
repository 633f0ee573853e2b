"""Long-form GL: plain 64 iterations vs fast-GL momentum (round 2).

The BASELINE "long-form GL-64" configuration is a 5-minute stream decoded
with 64 Griffin-Lim iterations at the flagship config. Fast-GL momentum
(ops/griffinlim.py) converges in ~2-4x fewer iterations, so the question
with a dollar value is: what does momentum-16 cost and deliver relative to
the plain-64 reference config on the real chip?

Measures, on one chip, single 5-min stream (unsharded op — the sharded
path adds only the halo exchange on top of the same loop):
  plain GL-64        : the reference-parity baseline
  momentum-0.99 GL-16: the candidate replacement
  plain GL-16        : iteration-count control
  momentum-0.99 GL-64: quality ceiling
each with pipelined-slope time and scale-invariant spectral convergence
(utils.metrics.spectral_convergence) against the mel-bottlenecked target.

Run from repo root: python benchmarks/exp_longform_momentum.py
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from gomel_tpu.core.config import MelConfig
from gomel_tpu.core.filterbank import inverse_mel_weights, mel_weights
from gomel_tpu.core.framing import pad_length
from gomel_tpu.ops.griffinlim import griffin_lim, griffin_lim_magnitudes
from gomel_tpu.ops.mel_ops import mel_encode, mel_to_linear
from gomel_tpu.ops.stft import hann_window
from gomel_tpu.utils.metrics import spectral_convergence

_chk = jax.jit(lambda y: jnp.sum(y))


def read(out):
    return float(_chk(out))


def slope(fn, argsets, n_lo=2, n_hi=6, trials=3):
    for a in argsets:
        assert np.isfinite(read(fn(*a)))

    def run(n):
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(*argsets[i % len(argsets)])
        read(out)
        return time.perf_counter() - t0

    t_lo = min(run(n_lo) for _ in range(trials))
    t_hi = min(run(n_hi) for _ in range(trials))
    return (t_hi - t_lo) / (n_hi - n_lo)


def main():
    cfg = MelConfig.cli_default()
    sr, minutes = 48000, 5.0
    N, hop = cfg.resolut, cfg.window
    window = jnp.asarray(hann_window(N), jnp.float32)
    fwd = jnp.asarray(mel_weights(cfg.n_bins, cfg.num_mels, cfg.mel_fmin,
                                  cfg.mel_fmax), jnp.float32)
    invw = jnp.asarray(inverse_mel_weights(cfg.n_bins, cfg.num_mels,
                                           cfg.mel_fmin, cfg.mel_fmax),
                       jnp.float32)

    n = pad_length(int(sr * 60 * minutes), hop)
    audio_s = n / sr
    t = np.arange(n) / sr
    x = (0.4 * np.sin(2 * np.pi * 440 * t)
         + 0.2 * np.sin(2 * np.pi * 2333 * t)
         + 0.1 * np.sin(2 * np.pi * 701 * t + 0.5)).astype(np.float32)

    enc = jax.jit(lambda v: mel_encode(v, cfg.num_mels, N, hop, fwd, window))
    mag = jax.jit(lambda v: griffin_lim_magnitudes(
        mel_to_linear(enc(v), invw, 1.0, 0.0)))(jnp.asarray(x))
    print(f"5-min stream: {n} samples, {mag.shape[0]} frames", flush=True)

    # two distinct keys so pipelined calls aren't memoized (CLAUDE.md)
    keys = [jax.random.PRNGKey(0), jax.random.PRNGKey(1)]
    for label, n_iter, mom in (("plain GL-64 (BASELINE config)", 64, 0.0),
                               ("momentum-0.99 GL-16", 16, 0.99),
                               ("momentum-0.99 GL-20", 20, 0.99),
                               ("momentum-0.99 GL-24", 24, 0.99),
                               ("momentum-0.99 GL-32", 32, 0.99),
                               ("plain GL-16 (control)", 16, 0.0),
                               ("momentum-0.99 GL-64", 64, 0.99)):
        f = jax.jit(lambda m, k, ni=n_iter, mm=mom: griffin_lim(
            m, hop, ni, k, None, fft_backend="auto", momentum=mm))
        sig = f(mag, keys[0])
        q = spectral_convergence(sig, mag, N, hop, window)
        per = slope(f, [(mag, k) for k in keys])
        print(f"  {label:32s} conv {q:.4f}   {per:6.2f} s/call   "
              f"{audio_s / per:6.0f} a-s/s", flush=True)


if __name__ == "__main__":
    main()
