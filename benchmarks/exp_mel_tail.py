"""Re-race the extended-weight single-matmul mel tail in a quiet window.

RESULTS.md "Extended-weight single-matmul mel tail" recorded the first
attempt as inconclusive (co-tenant load pushed same-program readings from
37k to 167k a-s/s). The candidate: instead of the shipped tail

    ch  = stack([mags[..., :-1], mags[..., 1:]], -1)   # [B, F, N/2, 2] copy
    mel = einsum("...bc,mb->...mc", ch, W)             # [B, F, M, 2]

build ONE extended filterbank We of shape [N/2+1, 2*M] with the ch0 and
ch1 weight columns interleaved (col m*2+c), where the ch1 block is the
same mel weights shifted one bin down:

    y   = mags @ We                                    # [B, F, 2*M]
    mel = y.reshape(..., M, 2)

This removes the [B, F, N/2, 2] channel-stack materialization (the only
non-matmul copy in the tail) at the cost of doubling the matmul N
dimension (2049x384 vs 2048x(192x2) — identical FLOPs, one dot instead of
a batched-c einsum).

Methodology per CLAUDE.md: interleaved within one process, order-alternating
rounds, medians, pipelined-slope timing, plus a same-program A/A spread
gauge to qualify the window (reject the run if spread > ~10%).

Run on the chip:  timeout 580 python benchmarks/exp_mel_tail.py
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
    from gomel_tpu.ops.fftbackend import rfft_mag
    from gomel_tpu.ops.mel_ops import mel_encode_batch, spectral_normalize
    from gomel_tpu.ops.stft import frame_signal, hann_window

    cfg = MelConfig.cli_default()
    sr, secs, batch = 48000, 30.0, 2
    n = pad_length(int(sr * secs), cfg.window)
    audio_s = batch * n / sr
    dev = jax.devices()[0]

    w_np = mel_weights(cfg.n_bins, cfg.num_mels, cfg.mel_fmin, cfg.mel_fmax)
    fwd = jnp.asarray(w_np, jnp.float32)
    window = jnp.asarray(hann_window(cfg.resolut), jnp.float32)

    # A: shipped batch-explicit encode (stack + einsum tail)
    encA = jax.jit(lambda x: mel_encode_batch(
        x, cfg.num_mels, cfg.resolut, cfg.window, fwd, window))

    # B: extended-weight single-matmul tail
    m = cfg.num_mels
    we_np = np.zeros((cfg.n_bins + 1, 2 * m), dtype=np.float32)
    we_np[:-1, 0::2] = w_np.T          # ch0: bins 0..N/2-1
    we_np[1:, 1::2] = w_np.T           # ch1: bins 1..N/2
    we = jnp.asarray(we_np)

    def encB_body(x):
        frames = jax.vmap(
            lambda s: frame_signal(s, cfg.resolut, cfg.window))(x)
        mags = rfft_mag(frames * window, cfg.resolut, "auto")
        y = jnp.einsum("bfn,nk->bfk", mags, we,
                       preferred_element_type=mags.dtype)
        mel = y.reshape(y.shape[0], y.shape[1], m, 2)
        return spectral_normalize(mel)

    encB = jax.jit(encB_body)

    rng = np.random.default_rng(0)
    xs = [jax.device_put(jnp.asarray(
        rng.standard_normal((batch, n)), jnp.float32), dev)
        for _ in range(2)]

    ya = np.asarray(encA(xs[0]))
    yb = np.asarray(encB(xs[0]))
    print(f"max|A-B| = {np.max(np.abs(ya - yb)):.3e}")

    def rate(fn):
        per = pipelined_time(fn, [(x,) for x in xs], 4, 24)
        return audio_s / per

    rounds = 6
    ra, rb, spread = [], [], []
    for i in range(rounds):
        order = [("A", encA), ("B", encB)] if i % 2 == 0 else \
                [("B", encB), ("A", encA)]
        vals = {}
        for name, fn in order:
            vals[name] = rate(fn)
        # same-program gauge: a second A reading right after
        a2 = rate(encA)
        spread.append(abs(a2 - vals["A"]) / max(vals["A"], a2))
        ra.append(vals["A"])
        rb.append(vals["B"])
        print(f"round {i}: A {vals['A']:,.0f}  B {vals['B']:,.0f}  "
              f"A2 {a2:,.0f}  (a-s/s)")

    ma, mb = float(np.median(ra)), float(np.median(rb))
    wins = sum(b > a for a, b in zip(ra, rb))
    print(f"\nmedian A {ma:,.0f}  median B {mb:,.0f}  "
          f"B/A {mb / ma:.3f}  B wins {wins}/{rounds}")
    print(f"same-program A spread: median "
          f"{float(np.median(spread)) * 100:.1f}%  max "
          f"{float(np.max(spread)) * 100:.1f}%")


if __name__ == "__main__":
    main()
