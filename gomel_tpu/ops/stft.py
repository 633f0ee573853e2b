"""Framed STFT for TPU.

TPU-native replacement for the reference's per-frame scalar STFT
(gossp ``stft.STFT``; vectorized semantics proven by the port at
/root/reference/phase.py:119-127): hop-aligned frame gather + Hann window +
batched real FFT over all frames at once.

Design notes (TPU):
- Frames are gathered with a hop-reshape + K shifted slices (K = ceil(N/hop), a
  small static constant — 4 for the flagship 4096/1280 config). This lowers to
  pure static slices/concats that XLA fuses; no dynamic gather.
- ``jnp.fft.rfft`` maps to XLA's FFT, which is already near speed-of-light on TPU.
- Everything is shape-static and jit/vmap-friendly; batch by vmapping over the
  leading axis.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def hann_window(frame_len: int) -> np.ndarray:
    """Symmetric Hann window of length ``frame_len``, float64.

    Matches ``np.hanning`` / gossp's Hanning: 0.5 - 0.5*cos(2*pi*n/(N-1))
    (reference port: /root/reference/phase.py:123)."""
    n = np.arange(frame_len, dtype=np.float64)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * n / (frame_len - 1))


def frame_signal(x: jax.Array, frame_len: int, hop: int) -> jax.Array:
    """Gather overlapping frames: x [L] -> [F, frame_len] with F = (L-N)//hop + 1.

    Hop-reshape trick: pad x to (F+K-1)*hop, view as hop-rows, and stack K
    shifted row-slices. All shapes static. (A lane-aligned ``take``-gather
    variant measures ~20% faster in isolation but 2% slower once fused with
    the FFT — XLA fuses static slices into downstream consumers better than
    gathers — so the slice form stays.)
    """
    L = x.shape[0]
    F = (L - frame_len) // hop + 1
    if F <= 0:
        raise ValueError(f"signal too short for framing: L={L}, frame_len={frame_len}")
    K = -(-frame_len // hop)  # ceil
    n_rows = max(F + K - 1, -(-L // hop))
    xp = jnp.pad(x, (0, n_rows * hop - L))
    rows = xp.reshape(n_rows, hop)
    # frames[i] = concat(rows[i], rows[i+1], ..., rows[i+K-1])[:frame_len]
    stacked = jnp.stack([rows[k:k + F] for k in range(K)], axis=1)  # [F, K, hop]
    return stacked.reshape(F, K * hop)[:, :frame_len]


def stft(x: jax.Array, frame_len: int, hop: int,
         window: jax.Array | None = None) -> jax.Array:
    """Real STFT: x [L] -> complex [F, frame_len//2 + 1] (rfft bins).

    The reference computes a full complex FFT and consumes both symmetric halves
    (/root/reference/mel/mel.go:50-66, phase/phase.go:45-64); since the input is
    real those halves are conjugates, so the rfft half-spectrum carries all
    information — the encoders below index it directly.
    """
    frames = frame_signal(x, frame_len, hop)
    if window is None:
        window = jnp.asarray(hann_window(frame_len), dtype=x.dtype)
    frames = frames * window
    return jnp.fft.rfft(frames, axis=-1)


# ---------------------------------------------------------------------------
# Device-side frame chunking for long-form analysis
# ---------------------------------------------------------------------------

def auto_frame_chunk(n_frames: int, threshold: int = 3072,
                     chunk: int = 1024) -> int | None:
    """Chunk size policy for frame-local analysis kernels: at the ~30 s
    serving shape the [F, frame_len] intermediates are VMEM-resident and
    chunking only adds loop overhead; past a few thousand frames they spill
    to HBM and a ``lax.map`` over fixed chunks restores VMEM residency —
    measured 2.03x at the 30-minute shape with chunk 1024 (1.9-2.0x across
    256-2048; benchmarks/exp_longform_chunked.py, RESULTS.md)."""
    return chunk if n_frames >= threshold else None


def map_frame_chunks(x: jax.Array, frame_len: int, hop: int, chunk: int,
                     per_chunk_fn) -> jax.Array:
    """Run a frame-local analysis kernel over ``chunk``-frame slices of a
    signal in ONE dispatch (``lax.map``), keeping each chunk's [chunk,
    frame_len] intermediates VMEM-resident.

    ``per_chunk_fn`` maps a signal segment of ``chunk*hop + frame_len - hop``
    samples to ``[chunk, ...]`` frame-wise outputs. The signal is zero-padded
    so every chunk is full; the result is sliced back to the true frame
    count — numerically identical to the unchunked kernel on the real frames
    (frames are analysis-independent; only shape-dependent XLA reduction
    order differs, ~1e-6 relative)."""
    L = x.shape[0]
    F = (L - frame_len) // hop + 1
    if F <= 0:
        raise ValueError(f"signal too short for framing: L={L}")
    n_chunks = -(-F // chunk)
    need = n_chunks * chunk * hop + frame_len - hop
    if need > L:
        x = jnp.pad(x, (0, need - L))
    seg_len = chunk * hop + frame_len - hop

    def one(c):
        seg = jax.lax.dynamic_slice(x, (c * chunk * hop,), (seg_len,))
        return per_chunk_fn(seg)

    out = jax.lax.map(one, jnp.arange(n_chunks))
    return out.reshape((n_chunks * chunk,) + out.shape[2:])[:F]
