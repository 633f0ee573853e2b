"""Experiment: device-side CHUNKED long-form mel encode vs the flat kernel.

At the 30-second serving shape the [F, 4096] frame intermediates stay
VMEM-resident (benchmarks/RESULTS.md batch sweep); at 30-minute shapes they
are ~1.1 GB and spill to HBM. The shipped ``frame_chunk`` path
(ops/stft.map_frame_chunks: ``lax.map`` over fixed-size frame chunks in one
dispatch) restores VMEM residency per chunk.

Measures the SHIPPED ``mel_encode(..., frame_chunk=cf)`` path against the
flat kernel at identical total work (map_frame_chunks slices back to the
true frame count), with the repo's pipelined-slope timing (bench.py
``pipelined_time``: alternating inputs, read-back-forced, small-N/large-N
slope cancels the ~27 ms tunnel RTT — CLAUDE.md methodology).

Run on the chip:  python benchmarks/exp_longform_chunked.py [--secs 1800]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=float, default=1800.0)
    ap.add_argument("--chunks", type=int, nargs="*",
                    default=[256, 512, 1024, 2048, 4096])
    ap.add_argument("--n-lo", type=int, default=3)
    ap.add_argument("--n-hi", type=int, default=12)
    args = ap.parse_args()

    from bench import pipelined_time
    from gomel_tpu.core.config import MelConfig
    from gomel_tpu.core.framing import pad_length
    from gomel_tpu.core.filterbank import mel_weights
    from gomel_tpu.ops.mel_ops import mel_encode

    cfg = MelConfig.cli_default()
    sr = 48000
    n = pad_length(int(sr * args.secs), cfg.window)
    audio_s = n / sr
    fwd = jnp.asarray(
        mel_weights(cfg.n_bins, cfg.num_mels, cfg.mel_fmin, cfg.mel_fmax),
        jnp.float32)
    rng = np.random.default_rng(0)
    xs = [jax.device_put(jnp.asarray(
        np.roll(rng.standard_normal(n).astype(np.float32), k)))
        for k in (0, 1234)]

    def run(frame_chunk, label):
        fn = jax.jit(lambda s: mel_encode(s, cfg.num_mels, cfg.resolut,
                                          cfg.window, fwd,
                                          frame_chunk=frame_chunk))
        per = pipelined_time(fn, [(x,) for x in xs],
                             n_lo=args.n_lo, n_hi=args.n_hi)
        print(f"{label}: {per*1e3:8.1f} ms/call -> {audio_s/per:8.0f} a-s/s",
              flush=True)
        return per

    t_flat = run(None, "flat (frame_chunk=None)")
    for cf in args.chunks:
        t = run(cf, f"shipped frame_chunk={cf:5d}")
        print(f"   speedup vs flat: {t_flat/t:.2f}x", flush=True)


if __name__ == "__main__":
    main()
