"""Fused phase round trip A/B (VERDICT r4 #7).

The bench's phase round-trip number (te + td) runs encode and decode as
two separate jitted dispatches; the intermediate spectrogram is a device
array (no host hop), but each call pays its own dispatch + scheduling.
This races ONE jitted encode->decode composition (XLA sees the whole
program; the spectrogram never materializes as a program boundary) against
the two-dispatch sequence at the serving shape, with the bench's
pipelined-slope timing (CLAUDE.md methodology — read-back RTT cancels).

Usage: python benchmarks/exp_fused_roundtrip.py [--secs 30] [--batch 2]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gomel_tpu.core.config import PhaseConfig  # noqa: E402
from gomel_tpu.core.framing import pad_length  # noqa: E402
from gomel_tpu.ops.phase_ops import phase_decode, phase_encode  # noqa: E402
from gomel_tpu.ops.stft import hann_window  # noqa: E402

_checksum = jax.jit(lambda y: jnp.sum(y))


def _read(out) -> float:
    return float(_checksum(out))


def pipelined_time(fn, argsets, n_lo, n_hi, trials=3):
    for a in argsets:
        if not np.isfinite(_read(fn(*a))):
            raise RuntimeError("non-finite output")

    def run(n):
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(*argsets[i % len(argsets)])
        _read(out)
        return time.perf_counter() - t0

    t_lo = min(run(n_lo) for _ in range(trials))
    t_hi = min(run(n_hi) for _ in range(trials))
    per = (t_hi - t_lo) / (n_hi - n_lo)
    return per if per > 0 else t_hi / n_hi


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=float, default=30.0)
    ap.add_argument("--batch", type=int, default=2)
    a = ap.parse_args()
    pc = PhaseConfig.cli_default()
    sr = 48000
    n = pad_length(int(sr * a.secs), pc.window)
    audio_s = a.batch * n / sr
    pwin = jnp.asarray(hann_window(pc.resolut), jnp.float32)
    rng = np.random.default_rng(0)
    xbs = [jnp.asarray(rng.standard_normal((a.batch, n)), jnp.float32)
           for _ in range(2)]

    pe = jax.jit(jax.vmap(lambda x: phase_encode(
        x, pc.num_freqs, pc.resolut, pc.window, pwin)))
    pd = jax.jit(jax.vmap(lambda s: phase_decode(
        s, pc.resolut, pc.window, 0.0, None)))

    def two_dispatch(x):
        return pd(pe(x))

    fused = jax.jit(jax.vmap(lambda x: phase_decode(
        phase_encode(x, pc.num_freqs, pc.resolut, pc.window, pwin),
        pc.resolut, pc.window, 0.0, None)))

    # parity first: same program content
    print("compiling two-dispatch...", file=sys.stderr, flush=True)
    a2 = np.asarray(two_dispatch(xbs[0]))
    print("compiling fused...", file=sys.stderr, flush=True)
    af = np.asarray(fused(xbs[0]))
    d = np.abs(af - a2)
    print(f"max |fused - two-dispatch| = {d.max():.3e}", file=sys.stderr)

    # interleaved rounds (shared-chip policy)
    t2 = tf = float("inf")
    for _ in range(3):
        t2 = min(t2, pipelined_time(two_dispatch, [(x,) for x in xbs], 8, 40,
                                    trials=1))
        tf = min(tf, pipelined_time(fused, [(x,) for x in xbs], 8, 40,
                                    trials=1))
    print(f"two-dispatch roundtrip: {t2 * 1e3:.2f} ms/call "
          f"({audio_s / t2:.0f} a-s/s)")
    print(f"fused roundtrip:        {tf * 1e3:.2f} ms/call "
          f"({audio_s / tf:.0f} a-s/s)")
    print(f"fused vs two-dispatch:  {(t2 / tf - 1) * 100:+.1f}%")


if __name__ == "__main__":
    main()
