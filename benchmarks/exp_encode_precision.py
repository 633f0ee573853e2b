"""Encode-path precision probe (VERDICT round 1, next-round item 5).

Question: must BOTH CT-FFT stages and the mel matmul run at HIGHEST, or is
there speed headroom at HIGH/DEFAULT for the encode path whose output feeds
log() (where near-silent bins amplify absolute spectrum error)?

Golden: float64 numpy mel encode of the same signal. Error metric: max abs
error in the LOG domain over all mel bins (the quantity the PNG stores).
Input: worst-case dynamic range — a full-scale tone plus -100 dB tones and
near-silence stretches, so quiet bins sit at the 1e-5 clamp where absolute
spectrum error of eps*peak turns into log error ~ log1p(eps*peak/1e-5).

Run from repo root on the TPU: python benchmarks/exp_encode_precision.py
Results are recorded in benchmarks/RESULTS.md ("Encode precision ladder").
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from gomel_tpu.core.config import MelConfig
from gomel_tpu.core.filterbank import mel_weights
from gomel_tpu.core.framing import pad_length
from gomel_tpu.ops import dft_mm, mxu_fft
from gomel_tpu.ops.stft import frame_signal, hann_window

_chk = jax.jit(lambda y: jnp.sum(y))


def read(out):
    return float(_chk(out))


def slope(fn, argsets, n_lo=4, n_hi=16, trials=3):
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
    sr, secs, batch = 48000, 30.0, 8
    n = pad_length(int(sr * secs), cfg.window)
    N, hop = cfg.resolut, cfg.window
    audio_s = batch * n / sr

    # worst-case signal: full-scale tone + -100 dB tones + silence
    t = np.arange(n) / sr
    x64 = (0.9 * np.sin(2 * np.pi * 440.5 * t)
           + 1e-5 * np.sin(2 * np.pi * 7003.1 * t)
           + 1e-6 * np.sin(2 * np.pi * 12345.6 * t))
    x64[: n // 8] = 0.0                      # hard silence
    x64[n // 2: n // 2 + n // 8] *= 1e-4     # near-silence stretch

    # float64 numpy golden (log-mel)
    w64 = hann_window(N)
    fr = np.lib.stride_tricks.sliding_window_view(x64, N)[::hop] * w64
    mags = np.abs(np.fft.rfft(fr, axis=-1))
    ch = np.stack([mags[:, :-1], mags[:, 1:]], axis=-1)
    fwd64 = mel_weights(cfg.n_bins, cfg.num_mels, cfg.mel_fmin, cfg.mel_fmax)
    mel64 = np.einsum("fbc,mb->fmc", ch, fwd64)
    golden = np.log(np.maximum(mel64, 1e-5))

    xb = jnp.asarray(np.broadcast_to(x64, (batch, n)), jnp.float32)
    xb2 = jnp.asarray(np.roll(np.broadcast_to(x64, (batch, n)), 1, axis=1),
                      jnp.float32)
    window = jnp.asarray(w64, jnp.float32)
    fwd = jnp.asarray(fwd64, jnp.float32)

    HI = jax.lax.Precision.HIGHEST
    H = jax.lax.Precision.HIGH
    D = jax.lax.Precision.DEFAULT

    def enc(x, fft_kind, fft_prec, mel_prec):
        frames = frame_signal(x, N, hop) * window
        if fft_kind == "ct":
            mag = mxu_fft.rfft_mag(frames, N, fft_prec)
        else:
            mag = dft_mm.rfft_mag(frames, N, fft_prec)
        chx = jnp.stack([mag[:, :-1], mag[:, 1:]], axis=-1)
        mel = jnp.einsum("fbc,mb->fmc", chx, fwd, precision=mel_prec,
                         preferred_element_type=chx.dtype)
        return jnp.log(jnp.maximum(mel, 1e-5))

    print(f"{'variant':28s} {'ms/call':>8s} {'a-s/s':>8s} "
          f"{'max |dlog|':>11s} {'p99.9 |dlog|':>12s}")
    for name, kind, fp, mp in (
            ("ct HIGHEST / mel HIGHEST", "ct", HI, HI),
            ("ct HIGHEST / mel DEFAULT", "ct", HI, D),
            ("ct HIGH    / mel HIGHEST", "ct", H, HI),
            ("ct HIGH    / mel HIGH", "ct", H, H),
            ("ct DEFAULT / mel DEFAULT", "ct", D, D),
            ("mm HIGHEST / mel HIGHEST", "mm", HI, HI),
            ("mm HIGH    / mel HIGH", "mm", H, H),
    ):
        f = jax.jit(jax.vmap(
            lambda v, kind=kind, fp=fp, mp=mp: enc(v, kind, fp, mp)))
        got = np.asarray(f(xb)[0], np.float64)
        err = np.abs(got - golden)
        per = slope(f, [(xb,), (xb2,)])
        print(f"{name:28s} {per*1e3:8.2f} {audio_s/per:8.0f} "
              f"{err.max():11.4f} {np.quantile(err, 0.999):12.4f}")


if __name__ == "__main__":
    main()
