"""Stage-level profiling of the two under-target decode paths (GL, phase).

Times each stage of the Griffin-Lim iteration and the direct iSTFT separately
on the real chip, interleaved best-of-3, to locate where the wall-clock goes
before attempting fusion. Run from repo root: python benchmarks/profile_decode.py
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from gomel_tpu.core.config import MelConfig, PhaseConfig
from gomel_tpu.core.filterbank import inverse_mel_weights
from gomel_tpu.ops.stft import frame_signal, hann_window
from gomel_tpu.ops.fftbackend import rfft_planes, irfft_planes
from gomel_tpu.ops.istft import overlap_add, window_sum, normalize_by_window_sum
from gomel_tpu.ops.mel_ops import mel_decode, mel_encode
from gomel_tpu.core.framing import pad_length


def best_of(fn, args, iters=8, trials=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3  # ms


def main():
    cfg = MelConfig.cli_default()
    sr, secs, batch = 48000, 30.0, 8
    n = pad_length(int(sr * secs), cfg.window)
    N, hop = cfg.resolut, cfg.window
    audio_s = batch * n / sr

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    rng = np.random.default_rng(0)
    sig = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)
    window = jnp.asarray(hann_window(N), jnp.float32)
    F = (n - N) // hop + 1
    print(f"n={n} F={F} N={N} hop={hop} batch={batch} audio_s={audio_s}")

    low = jax.lax.Precision.DEFAULT

    # stage 1: frame + window
    f_frame = jax.jit(jax.vmap(lambda s: frame_signal(s, N, hop) * window))
    frames = f_frame(sig)

    # stage 2: rfft (DEFAULT precision, mxu backend as in the GL loop)
    f_rfft = jax.jit(jax.vmap(lambda fr: jnp.stack(
        rfft_planes(fr, N, "auto", low))))
    planes = f_rfft(frames)

    # stage 3: phase normalize + mag multiply
    mag = jnp.abs(planes[:, 0]) + 0.1
    def phasenorm(p, m):
        re, im = p[0], p[1]
        a = jnp.sqrt(re * re + im * im)
        inv = jnp.where(a > 0, 1.0 / jnp.where(a > 0, a, 1.0), 0.0)
        return jnp.stack([jnp.where(a > 0, re * inv, 1.0) * m, im * inv * m])
    f_phase = jax.jit(jax.vmap(phasenorm))
    planes2 = f_phase(planes, mag)

    # stage 4: irfft (DEFAULT)
    f_irfft = jax.jit(jax.vmap(lambda p: irfft_planes(p[0], p[1], N, "auto", low)))
    rec = f_irfft(planes2)

    # stage 5: window + overlap-add
    f_oa = jax.jit(jax.vmap(lambda r: overlap_add(r * window, hop)))
    sig2 = f_oa(rec)

    t1 = best_of(f_frame, (sig,))
    t2 = best_of(f_rfft, (frames,))
    t3 = best_of(f_phase, (planes, mag))
    t4 = best_of(f_irfft, (planes2,))
    t5 = best_of(f_oa, (rec,))
    print(f"frame+window: {t1:.2f} ms")
    print(f"rfft DEFAULT: {t2:.2f} ms")
    print(f"phasenorm:    {t3:.2f} ms")
    print(f"irfft DEFAULT:{t4:.2f} ms")
    print(f"window+OA:    {t5:.2f} ms")
    print(f"sum:          {t1+t2+t3+t4+t5:.2f} ms")

    # full fused GL body (one iteration), as the fori_loop body would compile
    def gl_body(s, m):
        fr = frame_signal(s, N, hop) * window
        re, im = rfft_planes(fr, N, "auto", low)
        a = jnp.sqrt(re * re + im * im)
        inv = jnp.where(a > 0, 1.0 / jnp.where(a > 0, a, 1.0), 0.0)
        ure = jnp.where(a > 0, re * inv, 1.0)
        uim = im * inv
        rec = irfft_planes(m * ure, m * uim, N, "auto", low)
        return overlap_add(rec.astype(s.dtype) * window, hop)
    f_body = jax.jit(jax.vmap(gl_body))
    sflat = sig[:, : N + (F - 1) * hop]
    tb = best_of(f_body, (sflat, mag))
    print(f"fused one GL iteration: {tb:.2f} ms  "
          f"(x2 iters -> {2*tb:.2f} ms, {audio_s/(2*tb*1e-3):.0f} a-s/s)")

    # the actual full mel_decode as benched
    inv_w = jnp.asarray(inverse_mel_weights(cfg.n_bins, cfg.num_mels,
                                            cfg.mel_fmin, cfg.mel_fmax),
                        jnp.float32)
    fwdw = jnp.asarray(
        __import__("gomel_tpu.core.filterbank", fromlist=["mel_weights"])
        .mel_weights(cfg.n_bins, cfg.num_mels, cfg.mel_fmin, cfg.mel_fmax),
        jnp.float32)
    f_enc = jax.jit(jax.vmap(lambda x: mel_encode(
        x, cfg.num_mels, cfg.resolut, cfg.window, fwdw, window)))
    logmel = f_enc(sig)
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    f_dec = jax.jit(jax.vmap(lambda s, k: mel_decode(
        s, N, hop, inv_w, cfg.griffin_lim_iterations, k, 1.0, 0.0, window)))
    td = best_of(f_dec, (logmel, keys), iters=4)
    print(f"mel_decode full: {td:.2f} ms ({audio_s/(td*1e-3):.0f} a-s/s)")

    # phase decode stages
    pc = PhaseConfig.cli_default()
    pwin = jnp.asarray(hann_window(pc.resolut), jnp.float32)
    from gomel_tpu.ops.phase_ops import phase_decode, phase_encode
    f_pe = jax.jit(jax.vmap(lambda x: phase_encode(
        x, pc.num_freqs, pc.resolut, pc.window, pwin)))
    spec = f_pe(sig)
    f_pd = jax.jit(jax.vmap(lambda s: phase_decode(s, pc.resolut, pc.window,
                                                   0.0, pwin)))
    tpe = best_of(f_pe, (sig,))
    tpd = best_of(f_pd, (spec,))
    print(f"phase encode: {tpe:.2f} ms ({audio_s/(tpe*1e-3):.0f} a-s/s)")
    print(f"phase decode: {tpd:.2f} ms ({audio_s/(tpd*1e-3):.0f} a-s/s)")

    # phase decode, irfft at HIGHEST vs DEFAULT split
    grown = jnp.ones((batch, F, N // 2 + 1), jnp.float32)
    f_ir_hi = jax.jit(jax.vmap(lambda p: irfft_planes(p, p, N, "auto", None)))
    f_ir_lo = jax.jit(jax.vmap(lambda p: irfft_planes(p, p, N, "auto", low)))
    ti_hi = best_of(f_ir_hi, (grown,))
    ti_lo = best_of(f_ir_lo, (grown,))
    print(f"irfft HIGHEST: {ti_hi:.2f} ms   irfft DEFAULT: {ti_lo:.2f} ms")


if __name__ == "__main__":
    main()
