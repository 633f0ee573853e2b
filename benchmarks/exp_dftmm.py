"""Experiment: single-matmul DFT formulations + re-A/B of round-1 alternates
under the corrected (pipelined-slope) timing methodology.

Compares, at the flagship config (N=4096, hop=1280, batch 8 x 30 s):
  1. mel encode baseline (CT-MXU at HIGHEST)
  2. GL(2) decode: CT-MXU loop vs direct-DFT-matmul loop
  3. phase decode: CT irfft vs direct-DFT-matmul at HIGHEST/HIGH/DEFAULT

Run from repo root: python benchmarks/exp_dftmm.py
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from gomel_tpu.core.config import MelConfig, PhaseConfig
from gomel_tpu.core.filterbank import mel_weights, inverse_mel_weights
from gomel_tpu.core.framing import pad_length
from gomel_tpu.ops.mel_ops import mel_encode, mel_decode
from gomel_tpu.ops.phase_ops import phase_decode, phase_encode
from gomel_tpu.ops.stft import frame_signal, hann_window
from gomel_tpu.ops.istft import overlap_add, window_sum, normalize_by_window_sum
from gomel_tpu.ops.griffinlim import griffin_lim_magnitudes

_chk = jax.jit(lambda y: jnp.sum(y))


def read(out):
    return float(_chk(out))


def slope(fn, argsets, n_lo=4, n_hi=16, trials=3):
    for a in argsets:
        v = read(fn(*a))
        assert np.isfinite(v), f"non-finite output {v}"

    def run(n):
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(*argsets[i % len(argsets)])
        read(out)
        return time.perf_counter() - t0

    t_lo = min(run(n_lo) for _ in range(trials))
    t_hi = min(run(n_hi) for _ in range(trials))
    per = (t_hi - t_lo) / (n_hi - n_lo)
    return max(per, t_hi / n_hi / 100)


# --- direct DFT matmul weights ---------------------------------------------

@functools.lru_cache(maxsize=4)
def dft_fwd_np(n: int):
    """[n, 2*(n//2+1)] windowed forward rfft matrix (Hann folded in)."""
    w = hann_window(n)
    k = np.arange(n // 2 + 1)
    nn = np.arange(n)
    ang = 2.0 * np.pi * np.outer(nn, k) / n
    return np.concatenate([w[:, None] * np.cos(ang),
                           w[:, None] * -np.sin(ang)], axis=1)


@functools.lru_cache(maxsize=4)
def dft_inv_np(n: int, windowed: bool = True):
    """[2*(n//2+1), n] inverse rfft matrix (optionally post-window folded)."""
    w = hann_window(n) if windowed else np.ones(n)
    half = n // 2 + 1
    k = np.arange(half)
    nn = np.arange(n)
    c = np.full(half, 2.0)
    c[0] = 1.0
    c[-1] = 1.0
    ang = 2.0 * np.pi * np.outer(k, nn) / n
    wr = (c[:, None] / n) * np.cos(ang) * w[None, :]
    wi = -(c[:, None] / n) * np.sin(ang) * w[None, :]
    wi[0] = 0.0
    wi[-1] = 0.0
    return np.concatenate([wr, wi], axis=0)


def main():
    cfg = MelConfig.cli_default()
    sr, secs, batch = 48000, 30.0, 8
    n = pad_length(int(sr * secs), cfg.window)
    N, hop = cfg.resolut, cfg.window
    audio_s = batch * n / sr
    half = N // 2 + 1

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    rng = np.random.default_rng(0)
    xbs = [jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)
           for _ in range(2)]
    window = jnp.asarray(hann_window(N), jnp.float32)
    fwd = jnp.asarray(mel_weights(cfg.n_bins, cfg.num_mels, cfg.mel_fmin,
                                  cfg.mel_fmax), jnp.float32)
    inv = jnp.asarray(inverse_mel_weights(cfg.n_bins, cfg.num_mels,
                                          cfg.mel_fmin, cfg.mel_fmax),
                      jnp.float32)

    # ---- 1. mel encode baseline (the Pallas fused kernel this was once
    # compared against measured par and was removed in round 2; its source
    # is at commit 264462c^ if the comparison ever needs re-running) ----
    enc = jax.jit(jax.vmap(lambda x: mel_encode(
        x, cfg.num_mels, N, hop, fwd, window)))
    t = slope(enc, [(x,) for x in xbs])
    print(f"mel encode current : {t*1e3:7.2f} ms  {audio_s/t:8.0f} a-s/s")

    # ---- 2. GL decode: current vs direct-DFT-matmul loop ----
    logmels = [enc(x) for x in xbs]
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    gl_cur = jax.jit(jax.vmap(lambda s, k: mel_decode(
        s, N, hop, inv, cfg.griffin_lim_iterations, k, 1.0, 0.0, window)))
    t = slope(gl_cur, [(m, keys) for m in logmels], n_lo=3, n_hi=11)
    print(f"GL2 decode current : {t*1e3:7.2f} ms  {audio_s/t:8.0f} a-s/s")

    wf = jnp.asarray(dft_fwd_np(N), jnp.float32)
    wi = jnp.asarray(dft_inv_np(N), jnp.float32)
    low = jax.lax.Precision.DEFAULT

    def gl_mm_one(logmel2, key):
        # denormalize + undomel as in mel_decode, then mm-GL
        from gomel_tpu.ops.mel_ops import mel_to_linear
        lin2 = mel_to_linear(logmel2, inv, 1.0, 0.0)  # [F, n_bins, 2]
        mag = griffin_lim_magnitudes(lin2)            # [F, half]
        F = mag.shape[0]
        out_len = N + (F - 1) * hop
        sig = jax.random.uniform(key, (out_len,), jnp.float32)
        for _ in range(cfg.griffin_lim_iterations):
            frames = frame_signal(sig, N, hop)
            planes = jnp.matmul(frames, wf, precision=low)   # [F, 2*half]
            re, im = planes[:, :half], planes[:, half:]
            a = jnp.sqrt(re * re + im * im)
            inva = jnp.where(a > 0, 1.0 / jnp.where(a > 0, a, 1.0), 0.0)
            ure = jnp.where(a > 0, re * inva, 1.0)
            uim = im * inva
            z = jnp.concatenate([mag * ure, mag * uim], axis=1)
            rec_w = jnp.matmul(z, wi, precision=low)          # windowed rec
            sig = overlap_add(rec_w, hop)
        return sig

    try:
        gl_mm = jax.jit(jax.vmap(gl_mm_one))
        t = slope(gl_mm, [(m, keys) for m in logmels], n_lo=3, n_hi=11)
        print(f"GL2 decode dft-mm  : {t*1e3:7.2f} ms  {audio_s/t:8.0f} a-s/s")
        # quality: compare mel spectral convergence of both reconstructions
        s_cur = gl_cur(logmels[0], keys)
        s_mm = gl_mm(logmels[0], keys)
        m_cur = enc(s_cur[:, :n])
        m_mm = enc(s_mm[:, :n])
        ref = logmels[0]
        d_cur = float(_chk((m_cur - ref) ** 2)) ** 0.5
        d_mm = float(_chk((m_mm - ref) ** 2)) ** 0.5
        print(f"   spectral dist: current {d_cur:.4f}  mm {d_mm:.4f}")
    except Exception as e:
        print(f"GL dft-mm failed: {e!r}")

    # ---- 3. phase decode: current vs direct matmul at 3 precisions ----
    pc = PhaseConfig.cli_default()
    pwin = jnp.asarray(hann_window(pc.resolut), jnp.float32)
    pe = jax.jit(jax.vmap(lambda x: phase_encode(
        x, pc.num_freqs, pc.resolut, pc.window, pwin)))
    specs = [pe(x) for x in xbs]
    pd_cur = jax.jit(jax.vmap(lambda s: phase_decode(
        s, pc.resolut, pc.window, 0.0, pwin)))
    t = slope(pd_cur, [(s,) for s in specs])
    print(f"phase dec current  : {t*1e3:7.2f} ms  {audio_s/t:8.0f} a-s/s")

    from gomel_tpu.ops.phase_ops import grow_half_planes
    wiN = jnp.asarray(dft_inv_np(pc.resolut), jnp.float32)
    halfp = pc.resolut // 2 + 1

    def pd_mm_one(spec2, prec):
        re, im = grow_half_planes(spec2, pc.resolut // 2)
        F = re.shape[0]
        z = jnp.concatenate([re, im], axis=1)
        rec_w = jnp.matmul(z, wiN, precision=prec)
        sig = overlap_add(rec_w, pc.window)
        wsum = window_sum(pwin, F, pc.window)
        return normalize_by_window_sum(sig, wsum, 0.5 * jnp.max(wsum))

    for name, prec in (("HIGHEST", jax.lax.Precision.HIGHEST),
                       ("HIGH", jax.lax.Precision.HIGH),
                       ("DEFAULT", jax.lax.Precision.DEFAULT)):
        try:
            pd_mm = jax.jit(jax.vmap(lambda s: pd_mm_one(s, prec)))
            t = slope(pd_mm, [(s,) for s in specs])
            a = pd_cur(specs[0])
            b = pd_mm(specs[0])
            err = float(_chk(jnp.max(jnp.abs(a - b)))) / float(
                _chk(jnp.max(jnp.abs(a))))
            print(f"phase dec mm {name:8s}: {t*1e3:7.2f} ms  "
                  f"{audio_s/t:8.0f} a-s/s  max-rel-err {err:.2e}")
        except Exception as e:
            print(f"phase mm {name} failed: {e!r}")


if __name__ == "__main__":
    main()
