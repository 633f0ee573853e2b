"""Do the flagship tuning choices hold at the 44.1k family shapes?

VERDICT r3 item 3: the mxu_fft CT split (32x128 at N=4096,
_SPLIT_OVERRIDES) and the extended-weight single-matmul mel tail were
tuned at the 48k flagship shapes (F=1125, nf=1536). The 44.1k family has
F~1034 frames per 30 s and nf=836 — an odd, non-128-aligned bin count.
This experiment re-races both choices at those shapes, interleaved within
one process (CLAUDE.md timing methodology):

  1. mel encode @44.1k length: split 32x128 (shipped) vs 64x64
  2. mel tail   @44.1k length: extended single-matmul (shipped) vs
     stack+einsum
  3. phase encode nf=836:      split 32x128 (shipped) vs 64x64

Run on the chip:  timeout 580 python benchmarks/exp_family441.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import pipelined_time


def race(name, fns, argsets, audio_s, rounds=4):
    res = {k: [] for k in fns}
    for r in range(rounds):
        order = list(fns.items())
        if r % 2:  # alternate order to cancel slow drift
            order = order[::-1]
        for label, f in order:
            t = pipelined_time(f, argsets, n_lo=8, n_hi=40, trials=1)
            res[label].append(audio_s / t)
    print(f"-- {name}")
    for label, v in res.items():
        print(f"  {label:28s}: median {sorted(v)[len(v) // 2]:8.0f} "
              f"best {max(v):8.0f}  all {[int(x) for x in v]}", flush=True)
    return res


def main():
    from gomel_tpu.core.config import MelConfig, PhaseConfig
    from gomel_tpu.core.filterbank import mel_weights
    from gomel_tpu.core.framing import pad_length
    from gomel_tpu.ops import mxu_fft
    from gomel_tpu.ops.fftbackend import rfft_mag
    from gomel_tpu.ops.mel_ops import mel_encode_batch, spectral_normalize
    from gomel_tpu.ops.phase_ops import phase_encode
    from gomel_tpu.ops.stft import frame_signal, hann_window

    cfg = MelConfig.cli_default()
    pc = PhaseConfig.cli_default()
    sr, secs, batch = 44100, 30.0, 2
    n = pad_length(int(sr * secs), cfg.window)
    audio_s = batch * n / sr
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    xbs = [jax.device_put(jnp.asarray(
        rng.standard_normal((batch, n)), jnp.float32), dev) for _ in range(2)]

    fwd = jnp.asarray(mel_weights(cfg.n_bins, cfg.num_mels, cfg.mel_fmin,
                                  cfg.mel_fmax), jnp.float32)
    win = jnp.asarray(hann_window(cfg.resolut), jnp.float32)
    pwin = jnp.asarray(hann_window(pc.resolut), jnp.float32)

    orig_split = mxu_fft._split

    def with_split(n1, n2, build):
        mxu_fft._split = (lambda n_, a=n1, b=n2:
                          (a, b) if n_ == 4096 else orig_split(n_))
        mxu_fft._fwd_consts_np.cache_clear()
        mxu_fft._inv_consts_np.cache_clear()
        f = build()
        f(xbs[0]).block_until_ready()  # trace under this split
        mxu_fft._split = orig_split
        return f

    # 1. mel encode @44.1k: shipped 32x128 vs most-square 64x64
    enc = {}
    for n1, n2 in ((32, 128), (64, 64)):
        enc[f"mel encode {n1}x{n2}"] = with_split(n1, n2, lambda: jax.jit(
            lambda xb: mel_encode_batch(xb, cfg.num_mels, cfg.resolut,
                                        cfg.window, fwd, win)))
    outs = {k: np.asarray(f(xbs[0])) for k, f in enc.items()}
    ks = list(outs)
    print("max|diff| between splits:",
          float(np.abs(outs[ks[0]] - outs[ks[1]]).max()), flush=True)
    race("mel encode @44.1k length (F~%d)" % (n // cfg.window), enc,
         [(x,) for x in xbs], audio_s)

    # 2. mel tail @44.1k: shipped extended single-matmul vs stack+einsum
    def tail_stack(xb):
        frames = jax.vmap(
            lambda s: frame_signal(s, cfg.resolut, cfg.window))(xb)
        mags = rfft_mag(frames * win, cfg.resolut, "auto")
        ch = jnp.stack([mags[..., :-1], mags[..., 1:]], axis=-1)
        mel = jnp.einsum("...bc,mb->...mc", ch, fwd,
                         preferred_element_type=ch.dtype)
        return spectral_normalize(mel)

    tails = {
        "tail extended (shipped)": jax.jit(
            lambda xb: mel_encode_batch(xb, cfg.num_mels, cfg.resolut,
                                        cfg.window, fwd, win)),
        "tail stack+einsum": jax.jit(tail_stack),
    }
    race("mel tail @44.1k length", tails, [(x,) for x in xbs], audio_s)

    # 3. phase encode nf=836: split race at the odd bin count
    pe = {}
    for n1, n2 in ((32, 128), (64, 64)):
        pe[f"phase836 {n1}x{n2}"] = with_split(n1, n2, lambda: jax.jit(
            jax.vmap(lambda x: phase_encode(x, 836, pc.resolut, pc.window,
                                            pwin))))
    race("phase encode nf=836 @44.1k", pe, [(x,) for x in xbs], audio_s)


if __name__ == "__main__":
    main()
