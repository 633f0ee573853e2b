"""Interleaved A/B: do the DECODE paths gain from the batch-explicit form?

The mel ENCODE side gained ~15-25% from writing the batch program
explicitly instead of jit(vmap(codec)) (exp_shardmap_ab2.py, RESULTS.md).
This races the same transformation for the two decode paths at the batch-2
serving shape:

- phase decode: grow -> irfft -> windowed overlap-add -> window-sum norm
  (vmap moved inward to just overlap_add; irfft/elementwise batch-explicit)
- griffin-lim(2) decode: the fori_loop carry becomes [B, L]; vmap only
  around frame_signal/overlap_add inside the body

Inline variants only — productized (ops/) if and only if a win shows.

Run on the chip:  timeout 580 python benchmarks/exp_decode_batch_ab.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import pipelined_time


def main():
    from gomel_tpu.core.config import MelConfig, PhaseConfig
    from gomel_tpu.core.filterbank import inverse_mel_weights, mel_weights
    from gomel_tpu.core.framing import pad_length
    from gomel_tpu.ops import dft_mm
    from gomel_tpu.ops.fftbackend import irfft_planes, rfft_planes
    from gomel_tpu.ops.griffinlim import griffin_lim_magnitudes
    from gomel_tpu.ops.istft import (normalize_by_window_sum, overlap_add,
                                     window_sum)
    from gomel_tpu.ops.mel_ops import (mel_decode, mel_encode_batch,
                                       mel_to_linear)
    from gomel_tpu.ops.phase_ops import (grow_half_planes, phase_decode,
                                         phase_encode)
    from gomel_tpu.ops.stft import frame_signal, hann_window

    cfg = MelConfig.cli_default()
    pc = PhaseConfig.cli_default()
    sr, secs, batch = 48000, 30.0, 2
    n = pad_length(int(sr * secs), cfg.window)
    audio_s = batch * n / sr
    dev = jax.devices()[0]
    N = cfg.resolut
    hop = cfg.window
    win_np = hann_window(N)
    win = jnp.asarray(win_np, jnp.float32)

    rng = np.random.default_rng(0)
    xbs = [jax.device_put(jnp.asarray(
        rng.standard_normal((batch, n)), jnp.float32), dev) for _ in range(2)]

    # ---- phase decode variants -------------------------------------------
    pe = jax.jit(jax.vmap(lambda x: phase_encode(
        x, pc.num_freqs, pc.resolut, pc.window, win)))
    specs = [pe(x) for x in xbs]
    F = specs[0].shape[1]

    pd_vmap = jax.jit(jax.vmap(lambda s: phase_decode(
        s, pc.resolut, pc.window, 0.0, None)))

    @jax.jit
    def pd_batch(spec):
        re, im = jax.vmap(
            lambda s: grow_half_planes(s, N // 2))(spec)
        frames = irfft_planes(re, im, N, "xla").astype(jnp.float32) * win
        sig = jax.vmap(lambda f: overlap_add(f, hop))(frames)
        wsum = window_sum(win, F, hop)
        return normalize_by_window_sum(sig, wsum, 0.5 * jnp.max(wsum))

    # ---- griffin-lim(2) variants -----------------------------------------
    inv = jnp.asarray(inverse_mel_weights(cfg.n_bins, cfg.num_mels,
                                          cfg.mel_fmin, cfg.mel_fmax),
                      jnp.float32)
    fwd = jnp.asarray(mel_weights(cfg.n_bins, cfg.num_mels, cfg.mel_fmin,
                                  cfg.mel_fmax), jnp.float32)
    enc = jax.jit(lambda xb: mel_encode_batch(
        xb, cfg.num_mels, cfg.resolut, cfg.window, fwd, win))
    logmels = [enc(x) for x in xbs]
    keys = jax.random.split(jax.random.PRNGKey(0), batch)

    gl_vmap = jax.jit(jax.vmap(
        lambda s, k: mel_decode(s, cfg.resolut, cfg.window, inv,
                                cfg.griffin_lim_iterations, k, 1.0, 0.0,
                                None)))

    n_iter = cfg.griffin_lim_iterations
    low = jax.lax.Precision.DEFAULT

    @jax.jit
    def gl_batch(logmel, ks):
        lin = jax.vmap(lambda s: mel_to_linear(s, inv, 1.0, 0.0))(logmel)
        mag = jax.vmap(griffin_lim_magnitudes)(lin)      # [B, F, N/2+1]
        Fb = mag.shape[1]
        out_len = N + (Fb - 1) * hop
        sig0 = jax.vmap(lambda k: jax.random.uniform(
            k, (out_len,), dtype=jnp.float32))(ks)

        def body(sig, final):
            frames = jax.vmap(lambda s: frame_signal(s, N, hop))(sig)
            re, im = dft_mm.rfft_windowed(frames, N, win_np, low)
            a = jnp.sqrt(re * re + im * im)
            ainv = jnp.where(a > 0, 1.0 / jnp.where(a > 0, a, 1.0), 0.0)
            unit_re = jnp.where(a > 0, re * ainv, 1.0)
            unit_im = im * ainv
            if final:
                rec = irfft_planes(mag * unit_re, mag * unit_im, N, "xla")
                rec_w = rec.astype(jnp.float32) * win
            else:
                rec_w = dft_mm.irfft_windowed(mag * unit_re, mag * unit_im,
                                              N, win_np, low)
            return jax.vmap(lambda f: overlap_add(f, hop))(
                rec_w.astype(jnp.float32))

        sig = jax.lax.fori_loop(0, n_iter - 1, lambda _, s: body(s, False),
                                sig0, unroll=False)
        return body(sig, True)

    # correctness spot-checks before timing
    ref = np.asarray(pd_vmap(specs[0]))
    got = np.asarray(pd_batch(specs[0]))
    print("phase decode batch-vs-vmap max|diff|:",
          float(np.abs(ref - got).max()), flush=True)
    refg = np.asarray(gl_vmap(logmels[0], keys))
    gotg = np.asarray(gl_batch(logmels[0], keys))
    print("GL(2) batch-vs-vmap max|diff|:",
          float(np.abs(refg - gotg).max()),
          " (same keys -> same init; bf16 interior reduction order may",
          "differ slightly)", flush=True)

    variants = [
        ("pd vmap", pd_vmap, [(s,) for s in specs], (8, 40)),
        ("pd batch", pd_batch, [(s,) for s in specs], (8, 40)),
        ("gl vmap", gl_vmap, [(m, keys) for m in logmels], (5, 25)),
        ("gl batch", gl_batch, [(m, keys) for m in logmels], (5, 25)),
    ]
    res = {name: [] for name, _, _, _ in variants}
    for r in range(4):
        for name, f_, a_, (lo, hi) in variants:
            t = pipelined_time(f_, a_, n_lo=lo, n_hi=hi, trials=1)
            res[name].append(audio_s / t)
            print(f"round {r} {name:9s}: {audio_s / t:8.0f} a-s/s",
                  flush=True)
    print()
    for name, v in res.items():
        print(f"{name:9s}: best {max(v):8.0f}  median "
              f"{sorted(v)[len(v) // 2]:8.0f}  all {[int(x) for x in v]}")


if __name__ == "__main__":
    main()
