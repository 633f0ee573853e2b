"""Isolate WHY the 1x1-mesh shard_map mel encode outruns the plain path.

exp_shardmap_ab.py confirmed (interleaved, best-of-4) the sharded program is
~19% faster at the identical batch-2 x 30 s serving shape. Candidate causes:
  B. batch-explicit formulation (rfft_planes on [B, F, N] + explicit sqrt +
     "bfnc" einsum) vs vmap(mel_encode) ("fnc" einsum under vmap)
  C. weights passed as an ARGUMENT instead of a closed-over constant
  D. the plan's +3 padded frames (1125 vs 1122)
  E. the shard_map wrapper itself
Variants are timed interleaved in one process, best-of-N.

Run on the chip:  timeout 580 python benchmarks/exp_shardmap_ab2.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from jax import shard_map

from bench import pipelined_time


def main():
    from gomel_tpu.core.config import MelConfig
    from gomel_tpu.core.filterbank import mel_weights
    from gomel_tpu.core.framing import num_frames, pad_length
    from gomel_tpu.ops.fftbackend import rfft_planes
    from gomel_tpu.ops.mel_ops import mel_encode, spectral_normalize
    from gomel_tpu.ops.stft import frame_signal, hann_window
    from gomel_tpu.parallel import sharded as sh
    from gomel_tpu.parallel.mesh import DATA_AXIS, FRAME_AXIS, make_mesh

    cfg = MelConfig.cli_default()
    sr, secs, batch = 48000, 30.0, 2
    n = pad_length(int(sr * secs), cfg.window)
    audio_s = batch * n / sr
    dev = jax.devices()[0]

    w_np = mel_weights(cfg.n_bins, cfg.num_mels, cfg.mel_fmin, cfg.mel_fmax)
    fwd = jnp.asarray(w_np, jnp.float32)
    window = jnp.asarray(hann_window(cfg.resolut), jnp.float32)

    # A: shipped plain path
    plainA = jax.jit(jax.vmap(lambda x: mel_encode(
        x, cfg.num_mels, cfg.resolut, cfg.window, fwd, window)))

    # B: batch-explicit formulation, same 1122 frames, constant weights
    def body(x, w):
        frames = jax.vmap(
            lambda s: frame_signal(s, cfg.resolut, cfg.window))(x)
        re, im = rfft_planes(frames * window, cfg.resolut, "auto")
        mags = jnp.sqrt(re * re + im * im)
        ch = jnp.stack([mags[..., :-1], mags[..., 1:]], axis=-1)
        mel = jnp.einsum("bfnc,mn->bfmc", ch, w.astype(ch.dtype),
                         preferred_element_type=ch.dtype)
        return spectral_normalize(mel)

    plainB = jax.jit(lambda x: body(x, fwd))
    # C: weights as an argument
    plainC = jax.jit(body)

    # D: +halo samples so the frame count matches the plan's padded 1125
    mesh1 = make_mesh(data=1, frame=1, devices=[dev])
    plan = sh.plan_frame_sharding(
        num_frames(n, cfg.resolut, cfg.window), cfg.resolut, cfg.window, 1)
    n_ext = plan.sharded_signal_len + plan.halo
    plainD = jax.jit(lambda x: body(x, fwd))

    # E: shipped shard_map program
    enc_sh = sh.sharded_mel_encode_fn(mesh1, plan, cfg.num_mels, w_np)

    rng = np.random.default_rng(0)
    xbs = [jax.device_put(jnp.asarray(
        rng.standard_normal((batch, n)), jnp.float32), dev) for _ in range(2)]
    xds = [jnp.pad(x, ((0, 0), (0, n_ext - n))) for x in xbs]
    xps = [sh.pad_signal_for_plan(x, plan) for x in xbs]

    variants = [
        ("A plain vmap(mel_encode)", plainA, [(x,) for x in xbs]),
        ("B batch-explicit const-w", plainB, [(x,) for x in xbs]),
        ("C batch-explicit arg-w", plainC, [(x, fwd) for x in xbs]),
        ("D B @ 1125 frames", plainD, [(x,) for x in xds]),
        ("E shard_map 1x1", enc_sh, [(x,) for x in xps]),
    ]
    for name, f_, a_ in variants:
        float(jnp.sum(f_(*a_[0])))  # warm + fault check

    res = {name: [] for name, _, _ in variants}
    for r in range(3):
        for name, f_, a_ in variants:
            t = pipelined_time(f_, a_, n_lo=8, n_hi=40, trials=1)
            res[name].append(audio_s / t)
            print(f"round {r} {name:28s}: {audio_s / t:8.0f} a-s/s",
                  flush=True)
    print()
    for name, v in res.items():
        print(f"{name:28s}: best {max(v):8.0f}  median "
              f"{sorted(v)[len(v) // 2]:8.0f}")


if __name__ == "__main__":
    main()
