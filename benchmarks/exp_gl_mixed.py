"""GL mixed per-iteration inverse precision + batch-size sweep (round 2).

(a) Interior iterations synthesize a carry that the next forward re-analyzes;
    only errors that survive to the LAST inverse reach the output. Compare:
    all-DEFAULT, all-HIGH-inverse (adopted), and interior-DEFAULT/final-HIGH.
(b) Batch sweep at the flagship config under the corrected pipelined-slope
    timing (round-1's "4-8 x 30 s optimal, larger degrades 20%" was measured
    with the broken block_until_ready methodology).

Run from repo root: python benchmarks/exp_gl_mixed.py
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from gomel_tpu.core.config import MelConfig
from gomel_tpu.core.filterbank import mel_weights, inverse_mel_weights
from gomel_tpu.core.framing import pad_length
from gomel_tpu.ops.mel_ops import mel_encode, mel_to_linear
from gomel_tpu.ops.griffinlim import griffin_lim_magnitudes
from gomel_tpu.ops.stft import frame_signal, hann_window
from gomel_tpu.ops.istft import overlap_add
from gomel_tpu.ops import dft_mm

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
    sr, secs = 48000, 30.0
    n = pad_length(int(sr * secs), cfg.window)
    N, hop = cfg.resolut, cfg.window
    wnp = hann_window(N)
    window = jnp.asarray(wnp, jnp.float32)
    fwd = jnp.asarray(mel_weights(cfg.n_bins, cfg.num_mels, cfg.mel_fmin,
                                  cfg.mel_fmax), jnp.float32)
    invw = jnp.asarray(inverse_mel_weights(cfg.n_bins, cfg.num_mels,
                                           cfg.mel_fmin, cfg.mel_fmax),
                       jnp.float32)
    enc1 = jax.jit(lambda v: mel_encode(v, cfg.num_mels, N, hop, fwd, window))

    D = jax.lax.Precision.DEFAULT
    H = jax.lax.Precision.HIGH

    def gl(logmel2, key, inv_precs):
        lin2 = mel_to_linear(logmel2, invw, 1.0, 0.0)
        mag = griffin_lim_magnitudes(lin2)
        F = mag.shape[0]
        sig = jax.random.uniform(key, (N + (F - 1) * hop,), jnp.float32)
        for pi in inv_precs:
            frames = frame_signal(sig, N, hop)
            re, im = dft_mm.rfft_windowed(frames, N, wnp, D)
            a = jnp.sqrt(re * re + im * im)
            ia = jnp.where(a > 0, 1.0 / jnp.where(a > 0, a, 1.0), 0.0)
            ure = jnp.where(a > 0, re * ia, 1.0)
            uim = im * ia
            rec_w = dft_mm.irfft_windowed(mag * ure, mag * uim, N, wnp, pi)
            sig = overlap_add(rec_w, hop)
        return sig

    # quality on tonal input (single row)
    t = np.arange(2 * sr) / sr
    audio = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 2333 * t)
    nq = pad_length(len(audio), hop)
    xq = jnp.asarray(np.pad(audio, (0, nq - len(audio))), jnp.float32)
    lq = enc1(xq)
    key = jax.random.PRNGKey(0)
    print("quality (tonal spectral convergence, lower better):")
    for name, precs in (("D,D", (D, D)), ("D,H", (D, H)), ("H,H", (H, H))):
        f = jax.jit(lambda m, k, p=precs: gl(m, k, p))
        rec = f(lq, key)
        e2 = enc1(rec[:nq])
        scv = float(jnp.linalg.norm(e2 - lq) / jnp.linalg.norm(lq))
        print(f"  inv precs {name}: {scv:.4f}", flush=True)

    # speed at batch 8 x 30 s
    rng = np.random.default_rng(0)
    xb = [jnp.asarray(rng.standard_normal((8, n)), jnp.float32)
          for _ in range(2)]
    lb = [jax.jit(jax.vmap(enc1))(x) for x in xb]
    keys = jax.random.split(key, 8)
    audio_s = 8 * n / sr
    print("speed (batch 8 x 30 s):")
    for name, precs in (("D,D", (D, D)), ("D,H", (D, H)), ("H,H", (H, H))):
        f = jax.jit(jax.vmap(lambda m, k, p=precs: gl(m, k, p)))
        per = slope(f, [(m, keys) for m in lb])
        print(f"  inv precs {name}: {per*1e3:6.2f} ms  "
              f"{audio_s/per:7.0f} a-s/s", flush=True)

    # batch sweep on mel encode (headline)
    print("mel encode batch sweep (30 s rows):")
    for b in (2, 4, 8, 16, 32):
        xs = [jnp.asarray(rng.standard_normal((b, n)), jnp.float32)
              for _ in range(2)]
        f = jax.jit(jax.vmap(enc1))
        per = slope(f, [(x,) for x in xs], n_lo=3, n_hi=9)
        print(f"  batch {b:3d}: {per*1e3:7.2f} ms  "
              f"{b * n / sr / per:7.0f} a-s/s", flush=True)


if __name__ == "__main__":
    main()
