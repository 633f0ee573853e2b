"""Interleaved A/B: vmap(phase_encode) vs phase_encode_batch on the chip.

The mel formulation win (exp_shardmap_ab2.py) was measured directly; phase
encode was switched on the same reasoning, but its tail is slice+stack (no
filterbank matmul), so verify the batch-explicit form actually wins there
too. Also races the decode side both ways for completeness.

Run on the chip:  timeout 580 python benchmarks/exp_phase_batch_ab.py
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
    from gomel_tpu.core.config import PhaseConfig
    from gomel_tpu.core.framing import pad_length
    from gomel_tpu.ops.phase_ops import (phase_decode, phase_encode,
                                         phase_encode_batch)
    from gomel_tpu.ops.stft import hann_window

    pc = PhaseConfig.cli_default()
    sr, secs, batch = 48000, 30.0, 2
    n = pad_length(int(sr * secs), pc.window)
    audio_s = batch * n / sr
    dev = jax.devices()[0]
    pwin = jnp.asarray(hann_window(pc.resolut), jnp.float32)

    enc_vmap = jax.jit(jax.vmap(lambda x: phase_encode(
        x, pc.num_freqs, pc.resolut, pc.window, pwin)))
    enc_batch = jax.jit(lambda xb: phase_encode_batch(
        xb, pc.num_freqs, pc.resolut, pc.window, pwin))

    rng = np.random.default_rng(0)
    xbs = [jax.device_put(jnp.asarray(
        rng.standard_normal((batch, n)), jnp.float32), dev) for _ in range(2)]

    variants = [
        ("enc vmap", enc_vmap, [(x,) for x in xbs]),
        ("enc batch-explicit", enc_batch, [(x,) for x in xbs]),
    ]
    for name, f_, a_ in variants:
        float(jnp.sum(f_(*a_[0])))

    res = {name: [] for name, _, _ in variants}
    for r in range(4):
        for name, f_, a_ in variants:
            t = pipelined_time(f_, a_, n_lo=8, n_hi=40, trials=1)
            res[name].append(audio_s / t)
            print(f"round {r} {name:20s}: {audio_s / t:8.0f} a-s/s",
                  flush=True)
    print()
    for name, v in res.items():
        print(f"{name:20s}: best {max(v):8.0f}  median "
              f"{sorted(v)[len(v) // 2]:8.0f}")


if __name__ == "__main__":
    main()
