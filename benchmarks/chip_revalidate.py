"""One-shot chip revalidation after a tunnel outage (CLAUDE.md).

Runs, in order of increasing risk, with value read-backs after every step:
  1. trivial op (tunnel alive?)
  2. serving-shape mel encode (headline path intact?)
  3. SMALL auto-chunked shard_map encode (~4k frames — validates the
     chunked lax.map construct inside shard_map compiles/runs on the chip
     before anything launches a 30-minute one)
  4. chunked vs flat parity at that shape

Usage: timeout 580 python benchmarks/chip_revalidate.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    t0 = time.time()
    print("1. devices:", jax.devices(), flush=True)
    print("   trivial op:", float(jnp.sum(jnp.ones((128, 128)))),
          f"({time.time()-t0:.1f}s)", flush=True)

    from gomel_tpu.core.config import MelConfig
    from gomel_tpu.core.filterbank import mel_weights
    from gomel_tpu.core.framing import num_frames, pad_length
    from gomel_tpu.ops.mel_ops import mel_encode
    from gomel_tpu.parallel import sharded as sh
    from gomel_tpu.parallel.mesh import make_mesh

    cfg = MelConfig.cli_default()
    fwd = jnp.asarray(mel_weights(cfg.n_bins, cfg.num_mels, cfg.mel_fmin,
                                  cfg.mel_fmax), jnp.float32)
    n = pad_length(48000 * 30, cfg.window)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n), jnp.float32)
    enc = jax.jit(lambda s: mel_encode(s, cfg.num_mels, cfg.resolut,
                                       cfg.window, fwd))
    print("2. serving-shape encode sum:", float(jnp.sum(enc(x))),
          f"({time.time()-t0:.1f}s)", flush=True)

    mesh = make_mesh(data=1, frame=1, devices=jax.devices()[:1])
    f = 4100  # > 3072: auto-chunking engages, but compile stays small
    plan = sh.plan_frame_sharding(f, cfg.resolut, cfg.window, 1)
    w = mel_weights(cfg.n_bins, cfg.num_mels, cfg.mel_fmin, cfg.mel_fmax)
    xs = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, plan.sharded_signal_len)), jnp.float32)
    chunked = sh.sharded_mel_encode_fn(mesh, plan, cfg.num_mels, w)(xs)
    print("3. chunked shard_map encode sum:", float(jnp.sum(chunked)),
          f"({time.time()-t0:.1f}s)", flush=True)

    flat = sh.sharded_mel_encode_fn(mesh, plan, cfg.num_mels, w,
                                    frame_chunk=None)(xs)
    d = float(jnp.max(jnp.abs(chunked - flat)))
    print(f"4. chunked-vs-flat max|diff|: {d:.3e} ({time.time()-t0:.1f}s)",
          flush=True)
    assert d < 1e-3, d
    print("CHIP-REVALIDATE OK", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
