"""Fast Griffin-Lim (momentum) A/B at the flagship config (round 2).

Quality: scale-invariant spectral convergence (the reference GL's
overlap-add is un-normalized, so the reconstruction carries a fixed scale;
the optimal least-squares c is factored out) on tonal input vs iteration
count, plain (momentum=0) vs accelerated (momentum=0.99).

Speed: pipelined-slope per-call time at the batch-2 serving shape to
confirm the momentum carry (one extra signal buffer + one axpy per
iteration) is free within noise.

Run from repo root: python benchmarks/exp_gl_momentum.py
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
from gomel_tpu.ops.stft import frame_signal, hann_window

_chk = jax.jit(lambda y: jnp.sum(y))


def read(out):
    return float(_chk(out))


def slope(fn, argsets, n_lo=3, n_hi=11, trials=3):
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
    sr = 48000
    N, hop = cfg.resolut, cfg.window
    wnp = hann_window(N)
    window = jnp.asarray(wnp, jnp.float32)
    fwd = jnp.asarray(mel_weights(cfg.n_bins, cfg.num_mels, cfg.mel_fmin,
                                  cfg.mel_fmax), jnp.float32)
    invw = jnp.asarray(inverse_mel_weights(cfg.n_bins, cfg.num_mels,
                                           cfg.mel_fmin, cfg.mel_fmax),
                       jnp.float32)
    enc1 = jax.jit(lambda v: mel_encode(v, cfg.num_mels, N, hop, fwd, window))

    # quality: tonal 10 s through the real mel bottleneck
    t = np.arange(10 * sr) / sr
    audio = (0.4 * np.sin(2 * np.pi * 440 * t)
             + 0.2 * np.sin(2 * np.pi * 2333 * t))
    nq = pad_length(len(audio), hop)
    xq = jnp.asarray(np.pad(audio, (0, nq - len(audio))), jnp.float32)
    mag = griffin_lim_magnitudes(mel_to_linear(enc1(xq), invw, 1.0, 0.0))
    key = jax.random.PRNGKey(0)

    def resid(sig):
        frames = frame_signal(sig, N, hop)
        a = jnp.abs(jnp.fft.rfft(frames * window, axis=-1))  # real on device
        c = jnp.vdot(a, mag) / jnp.vdot(mag, mag)
        return jnp.linalg.norm(a - c * mag) / (jnp.abs(c) * jnp.linalg.norm(mag))

    resid_j = jax.jit(resid)
    print("quality (scale-invariant spectral convergence, lower better):")
    for n_iter in (4, 16, 64):
        row = [f"  iters {n_iter:3d}:"]
        for mom in (0.0, 0.99):
            f = jax.jit(lambda m, k, ni=n_iter, mm=mom: griffin_lim(
                m, hop, ni, k, None, fft_backend="auto", momentum=mm))
            r = float(resid_j(f(mag, key)))
            row.append(f"m={mom}: {r:.4f}")
        print("  ".join(row), flush=True)

    # speed at the serving shape
    n = pad_length(int(sr * 30.0), hop)
    rng = np.random.default_rng(0)
    xb = [jnp.asarray(rng.standard_normal((2, n)), jnp.float32)
          for _ in range(2)]
    mags = [jax.jit(jax.vmap(lambda v: griffin_lim_magnitudes(
        mel_to_linear(enc1(v), invw, 1.0, 0.0))))(x) for x in xb]
    keys = jax.random.split(key, 2)
    audio_s = 2 * n / sr
    print("speed (batch 2 x 30 s, serving shape):")
    for n_iter in (2, 16):  # serving + quality-heavy points
        for mom in (0.0, 0.99):
            f = jax.jit(jax.vmap(lambda m, k, ni=n_iter, mm=mom: griffin_lim(
                m, hop, ni, k, None, fft_backend="auto", momentum=mm)))
            per = slope(f, [(m, keys) for m in mags])
            print(f"  iters {n_iter:3d} m={mom}: {per*1e3:7.2f} ms  "
                  f"{audio_s/per:7.0f} a-s/s", flush=True)


if __name__ == "__main__":
    main()
