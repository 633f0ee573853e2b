"""Fused mel-encode Pallas kernel: signal -> log-mel in ONE kernel launch.

The XLA pipeline (ops/mel_ops.py) materializes ~1.5 GB of HBM intermediates
per 240 audio-seconds: the 3.2x-expanded frame tensor, two FFT-stage planes,
magnitudes, and the channel stack. This kernel keeps the whole chain —
hop-gather, Hann window, both MXU FFT stages, twiddle, magnitude, the two
shifted filterbank matmuls, and the log — in VMEM per block of frames; HBM
traffic drops to roughly one read of the signal plus the [F, M, 2] output.

Layout notes (hard-won on this toolchain):
- Everything keeps a 128-lane last dimension; the Mosaic compiler in this
  image crashes on sub-128 lane DMAs and on reshapes whose lane dim is not
  128-aligned.
- FFT split: N1 = 128 (fast index = lanes), N2 = frame_len/128 (sublanes).
  A frame is a contiguous [N2, 128] row-block of the hop-aligned signal, so
  the gather is a dynamic row-slice, no transpose.
- Stage outputs keep dot_general's natural order; the spectrum lands
  k1-major (b' = 128*k1 + k2 holds bin k = k1 + N2*k2), so the filterbank
  matrix is pre-permuted host-side instead of transposing magnitudes.

Requirements (checked via ``supported``): frame_len % 128 == 0,
frame_len <= 128*128, hop % 128 == 0 (flagship 4096/1280 satisfies all).
Anything else falls back to the XLA-graph path (ops/mel_ops.py).

Reference behavior fused: /root/reference/mel/mel.go:46-74 (ToMel),
/root/reference/mel/impl.go:310-345 + 410-419 (domel + spectral_normalize).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..stft import hann_window

PREC = jax.lax.Precision.HIGHEST
N1 = 128


def supported(frame_len: int, hop: int) -> bool:
    return (frame_len % N1 == 0 and frame_len // N1 <= 128
            and hop % N1 == 0 and frame_len >= N1)


@functools.lru_cache(maxsize=4)
def _consts_np(frame_len: int):
    """DFT stage matrices for the N1=128 x N2 split (decimation in time,
    n = n1 + N1*n2, k = k1 + N2*k2)."""
    n2 = frame_len // N1
    a1, a2 = np.arange(N1), np.arange(n2)
    w2 = np.exp(-2j * np.pi * np.outer(a2, a2) / n2)            # [n2, k1]
    tw = np.exp(-2j * np.pi * np.outer(a1, a2) / frame_len)      # [n1, k1]
    w1 = np.exp(-2j * np.pi * np.outer(a1, a1) / N1)             # [n1, k2]
    return n2, w2, tw, w1


def _kernel(chunk_ref, win_ref, w2r_ref, w2i_ref, twr_ref, twi_ref,
            w1r_ref, w1i_ref, melw0_ref, melw1_ref, out_ref,
            xw_ref, *, block_f, rows_per_hop, n2, fft_prec, mel_prec):
    win = win_ref[...]          # [n2, 128]

    def gather(f, _):
        xw_ref[f] = chunk_ref[0, 0, pl.ds(f * rows_per_hop, n2), :] * win
        return 0

    jax.lax.fori_loop(0, block_f, gather, 0)
    xw = xw_ref[...]            # [f, n2, n1]

    dn = (((1,), (0,)), ((), ()))
    # stage 1: Y[f, n1, k1] = sum_n2 xw[f, n2, n1] * W2[n2, k1]
    yr = jax.lax.dot_general(xw, w2r_ref[...], dn, precision=fft_prec,
                             preferred_element_type=jnp.float32)
    yi = jax.lax.dot_general(xw, w2i_ref[...], dn, precision=fft_prec,
                             preferred_element_type=jnp.float32)
    # twiddle [n1, k1]
    zr = yr * twr_ref[...] - yi * twi_ref[...]
    zi = yr * twi_ref[...] + yi * twr_ref[...]
    # stage 3: X[f, k1, k2] = sum_n1 Z[f, n1, k1] * W1[n1, k2]
    xr = (jax.lax.dot_general(zr, w1r_ref[...], dn, precision=fft_prec,
                              preferred_element_type=jnp.float32)
          - jax.lax.dot_general(zi, w1i_ref[...], dn, precision=fft_prec,
                                preferred_element_type=jnp.float32))
    xi = (jax.lax.dot_general(zi, w1r_ref[...], dn, precision=fft_prec,
                              preferred_element_type=jnp.float32)
          + jax.lax.dot_general(zr, w1i_ref[...], dn, precision=fft_prec,
                                preferred_element_type=jnp.float32))
    # magnitudes, k1-major flat layout b' = 128*k1 + k2
    mags = jnp.sqrt(xr * xr + xi * xi).reshape(block_f, n2 * N1)

    ch0 = jax.lax.dot_general(mags, melw0_ref[...], dn, precision=mel_prec,
                              preferred_element_type=jnp.float32)
    ch1 = jax.lax.dot_general(mags, melw1_ref[...], dn, precision=mel_prec,
                              preferred_element_type=jnp.float32)
    # [.., M, 2] output blocks and multi-output kernels fault this Mosaic
    # toolchain; pack channels on the sublane-adjacent axis instead
    # ([f, 2, M]) and let the caller transpose to the [F, M, 2] API layout.
    out_ref[0] = jnp.log(jnp.maximum(jnp.stack([ch0, ch1], axis=1), 1e-5))


@functools.partial(jax.jit, static_argnames=("num_mels", "frame_len", "hop",
                                             "block_f", "interpret",
                                             "fft_prec", "mel_prec"))
def mel_encode_fused(x: jax.Array, fwd_weights: jax.Array, num_mels: int,
                     frame_len: int, hop: int, block_f: int = 64,
                     interpret: bool = False,
                     fft_prec=jax.lax.Precision.HIGHEST,
                     mel_prec=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Batched fused mel encode: [B, L] -> [B, F, num_mels, 2].

    F = (L - frame_len)//hop + 1 frames are produced, padded internally to a
    multiple of block_f (extra frames sliced off before returning).
    fwd_weights: [num_mels, frame_len//2] (core.filterbank.mel_weights).
    """
    if not supported(frame_len, hop):
        raise ValueError(f"unsupported geometry {frame_len}/{hop}")
    n2, w2, tw, w1 = _consts_np(frame_len)
    n_bins = frame_len // 2
    B, L = x.shape
    F = (L - frame_len) // hop + 1
    if F <= 0:
        raise ValueError("signal shorter than one frame")
    f_pad = -(-F // block_f) * block_f
    rows_per_hop = hop // N1
    n_blocks = f_pad // block_f
    chunk_rows = -(-((block_f - 1) * rows_per_hop + n2) // 8) * 8
    need_rows = (n_blocks - 1) * block_f * rows_per_hop + chunk_rows
    total = need_rows * N1
    if total > L:
        x = jnp.pad(x, ((0, 0), (0, total - L)))
    else:
        x = x[:, :total]
    sig_rows = x.reshape(B, need_rows, N1)
    # pre-overlapped chunk tensor: strided 3-D HBM DMAs crash this Mosaic
    # toolchain, so the 6-7% chunk overlap is materialized host-side and the
    # kernel consumes plain pipelined VMEM blocks.
    chunks = jnp.stack(
        [jax.lax.slice_in_dim(sig_rows, j * block_f * rows_per_hop,
                              j * block_f * rows_per_hop + chunk_rows, axis=1)
         for j in range(n_blocks)], axis=1)     # [B, nblk, chunk_rows, 128]

    # pre-permute the filterbank for the kernel's k1-major magnitude layout:
    # row b' = 128*k1 + k2 of the permuted matrix holds the weight of bin
    # k = k1 + n2*k2 (zero for k past the stored bins — upper mirror half).
    k1g, k2g = np.meshgrid(np.arange(n2), np.arange(N1), indexing="ij")
    k_of_bp = (k1g + n2 * k2g).reshape(-1)                   # [n2*128]
    wt = fwd_weights.T.astype(jnp.float32)                   # [n_bins, M]
    mask0 = k_of_bp < n_bins
    mask1 = (k_of_bp >= 1) & (k_of_bp <= n_bins)
    idx0 = np.clip(k_of_bp, 0, n_bins - 1)
    idx1 = np.clip(k_of_bp - 1, 0, n_bins - 1)
    perm0 = jnp.where(jnp.asarray(mask0)[:, None], wt[idx0], 0.0)
    perm1 = jnp.where(jnp.asarray(mask1)[:, None], wt[idx1], 0.0)

    win = jnp.asarray(hann_window(frame_len).reshape(n2, N1), jnp.float32)
    consts = [win,
              jnp.asarray(w2.real, jnp.float32), jnp.asarray(w2.imag, jnp.float32),
              jnp.asarray(tw.real, jnp.float32), jnp.asarray(tw.imag, jnp.float32),
              jnp.asarray(w1.real, jnp.float32), jnp.asarray(w1.imag, jnp.float32),
              perm0, perm1]

    kernel = functools.partial(_kernel, block_f=block_f,
                               rows_per_hop=rows_per_hop, n2=n2,
                               fft_prec=fft_prec, mel_prec=mel_prec)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, f_pad, 2, num_mels), jnp.float32),
        grid=(B, n_blocks),
        in_specs=[pl.BlockSpec((1, 1, chunk_rows, N1),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(c.shape, lambda i, j: (0,) * c.ndim,
                        memory_space=pltpu.VMEM) for c in consts],
        out_specs=pl.BlockSpec((1, block_f, 2, num_mels),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block_f, n2, N1), jnp.float32),
        ],
        interpret=interpret,
    )(chunks.astype(jnp.float32), *consts)
    return jnp.moveaxis(out[:, :F], 2, 3)
