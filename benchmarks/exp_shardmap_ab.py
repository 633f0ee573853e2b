"""Interleaved A/B: plain vmap mel encode vs the 1x1-mesh shard_map program.

bench.py measures the two paths minutes apart in one process; a 2026-08-18
run showed the sharded program 14% FASTER (87.4k vs 76.2k a-s/s), outside
the usual shard_map-tax noise band (-2..+5%). Shared-chip drift between the
two measurement moments is the suspected cause (CLAUDE.md: compare
alternatives INTERLEAVED). This experiment interleaves them round-robin,
best-of-N, to decide: real effect (adopt the sharded framing in the plain
path) or drift (document the band).

Run on the chip:  timeout 580 python benchmarks/exp_shardmap_ab.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import pipelined_time


def main():
    from gomel_tpu.core.config import MelConfig
    from gomel_tpu.core.filterbank import mel_weights
    from gomel_tpu.core.framing import num_frames, pad_length
    from gomel_tpu.ops.mel_ops import mel_encode
    from gomel_tpu.ops.stft import hann_window
    from gomel_tpu.parallel import sharded as sh
    from gomel_tpu.parallel.mesh import make_mesh

    cfg = MelConfig.cli_default()
    sr, secs, batch = 48000, 30.0, 2
    n = pad_length(int(sr * secs), cfg.window)
    audio_s = batch * n / sr
    dev = jax.devices()[0]

    w = mel_weights(cfg.n_bins, cfg.num_mels, cfg.mel_fmin, cfg.mel_fmax)
    fwd = jnp.asarray(w, jnp.float32)
    window = jnp.asarray(hann_window(cfg.resolut), jnp.float32)

    plain = jax.jit(jax.vmap(lambda x: mel_encode(
        x, cfg.num_mels, cfg.resolut, cfg.window, fwd, window)))

    mesh1 = make_mesh(data=1, frame=1, devices=[dev])
    plan = sh.plan_frame_sharding(
        num_frames(n, cfg.resolut, cfg.window), cfg.resolut, cfg.window, 1)
    enc_sh = sh.sharded_mel_encode_fn(mesh1, plan, cfg.num_mels, w)

    rng = np.random.default_rng(0)
    xbs = [jax.device_put(jnp.asarray(
        rng.standard_normal((batch, n)), jnp.float32), dev) for _ in range(2)]
    xps = [sh.pad_signal_for_plan(x, plan) for x in xbs]

    # warm both
    for f_, a_ in ((plain, xbs), (enc_sh, xps)):
        float(jnp.sum(f_(a_[0])))

    rounds = 4
    res = {"plain": [], "sharded": []}
    for r in range(rounds):
        for name, f_, a_ in (("plain", plain, xbs), ("sharded", enc_sh, xps)):
            t = pipelined_time(f_, [(x,) for x in a_], n_lo=8, n_hi=40,
                               trials=1)
            res[name].append(audio_s / t)
            print(f"round {r} {name:8s}: {audio_s / t:8.0f} a-s/s",
                  flush=True)
    for name, v in res.items():
        print(f"{name:8s}: best {max(v):８.0f} median {sorted(v)[len(v)//2]:.0f}"
              .replace("８", "8"), flush=True)
    print(f"sharded/plain (best): {max(res['sharded']) / max(res['plain']):.3f}")


if __name__ == "__main__":
    main()
