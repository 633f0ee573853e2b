"""Experiment: device-side CHUNKED long-form mel encode vs the flat kernel.

At the 30-second serving shape the [F, 4096] frame intermediates stay
VMEM-resident (benchmarks/RESULTS.md batch sweep); at 30-minute shapes they
are ~1.1 GB and spill to HBM, costing ~3.4x per audio-second (RESULTS.md
"Hour-scale"). Hypothesis: a ``lax.map`` over fixed-size frame chunks —
each chunk sliced from the signal on device, encoded, and written to the
output — restores VMEM residency per chunk and most of the serving-shape
rate, in ONE dispatch (unlike pipelines/streaming.py, which chunks from the
host).

Run on the chip:  python benchmarks/exp_longform_chunked.py [--secs 1800]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def chunked_mel_encode_fn(num_mels, frame_len, hop, fwd, chunk_frames,
                          n_frames_padded, fft_backend="auto"):
    """[L_pad + halo] signal -> [F_pad, num_mels, 2], lax.map over chunks of
    ``chunk_frames`` frames (n_frames_padded must be a multiple)."""
    from gomel_tpu.ops.mel_ops import mel_encode

    assert n_frames_padded % chunk_frames == 0
    n_chunks = n_frames_padded // chunk_frames
    chunk_samples = chunk_frames * hop
    need = chunk_samples + frame_len - hop  # analysis halo into next chunk
    fwd = jnp.asarray(fwd, jnp.float32)

    @jax.jit
    def enc(x_ext):  # [n_frames_padded*hop + frame_len - hop]
        def one(c):
            seg = jax.lax.dynamic_slice(x_ext, (c * chunk_samples,), (need,))
            return mel_encode(seg, num_mels, frame_len, hop, fwd,
                              fft_backend=fft_backend)

        out = jax.lax.map(one, jnp.arange(n_chunks))
        return out.reshape(n_frames_padded, num_mels, 2)

    return enc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=float, default=1800.0)
    ap.add_argument("--chunks", type=int, nargs="*",
                    default=[256, 512, 1024, 2048, 4096])
    args = ap.parse_args()

    from gomel_tpu.core.config import MelConfig
    from gomel_tpu.core.framing import num_frames, pad_length
    from gomel_tpu.core.filterbank import mel_weights
    from gomel_tpu.ops.mel_ops import mel_encode

    cfg = MelConfig.cli_default()
    sr = 48000
    n = pad_length(int(sr * args.secs), cfg.window)
    f = num_frames(n, cfg.resolut, cfg.window)
    audio_s = n / sr
    fwd = mel_weights(cfg.n_bins, cfg.num_mels, cfg.mel_fmin, cfg.mel_fmax)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n).astype(np.float32)
    x2 = np.roll(x, 1234)

    def timed(fn, a, b, label):
        out = fn(a); out = fn(b)
        chk = float(jnp.sum(out))
        t0 = time.time(); fn(a); o = fn(b); float(jnp.sum(o))
        per = (time.time() - t0) / 2
        print(f"{label}: {per*1e3:8.1f} ms/call -> {audio_s/per:8.0f} a-s/s "
              f"(chk {chk:.1f})", flush=True)
        return per

    # flat baseline
    fwdj = jnp.asarray(fwd, jnp.float32)
    flat = jax.jit(lambda s: mel_encode(s, cfg.num_mels, cfg.resolut,
                                        cfg.window, fwdj))
    xd = jax.device_put(jnp.asarray(x))
    xd2 = jax.device_put(jnp.asarray(x2))
    t_flat = timed(flat, xd, xd2, "flat (current)      ")

    for cf in args.chunks:
        f_pad = -(-f // cf) * cf
        need = f_pad * cfg.window + cfg.resolut - cfg.window
        xe = jax.device_put(jnp.asarray(np.pad(x, (0, need - n))))
        xe2 = jax.device_put(jnp.asarray(np.pad(x2, (0, need - n))))
        enc = chunked_mel_encode_fn(cfg.num_mels, cfg.resolut, cfg.window,
                                    fwd, cf, f_pad)
        t = timed(enc, xe, xe2, f"chunked cf={cf:5d}   ")
        print(f"   speedup vs flat: {t_flat/t:.2f}x", flush=True)


if __name__ == "__main__":
    main()
