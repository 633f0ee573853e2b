"""FFT as MXU matmuls — the TPU-native FFT path.

XLA's TPU FFT runs on the vector unit and materializes complex outputs; for
the codec's 4096-point frames it measures ~3x slower than expressing the same
transform as a Cooley-Tukey N = N1*N2 decomposition whose two small DFT stages
are real matmuls on the 128x128 systolic array (measured on TPU v5e: full mel
pipeline 8.7ms -> 5.8ms per 240 audio-seconds, interleaved A/B).

Math (decimation-in-time, N1 = N2 = 64 for N = 4096):
  view x[n], n = n1 + N1*n2 as a matrix x[n1, n2]
  stage 1:  Y[n1, k1] = sum_{n2} x[n1, n2] * W_{N2}^{n2 k1}
  stage 2:  Z[n1, k1] = Y[n1, k1] * W_N^{n1 k1}          (twiddle)
  stage 3:  X[k1 + N1*k2] = sum_{n1} Z[n1, k1] * W_{N1}^{n1 k2}
Real input means stage 1 is 2 real matmuls; stages are kept in separate
real/imag planes throughout (complex64 arrays are avoided — TPU handles them
poorly and the axon transport can't ship them). For the rfft only bins
k <= N/2 are needed, so stage 3 computes just floor((N/2)/N1)+1 of the k2
rows (restricted W1 matrix).

Precision: jax.lax.Precision.HIGHEST (6-pass bf16 = f32-equivalent matmuls,
relative error ~3e-7 of max vs np.fft, same class as XLA's f32 FFT).

Replaces the reference's go-dsp FFT usage (/root/reference/mel/mel.go:76-139,
phase/phase.go:93-133) on the TPU path; kernels in ops/stft.py, ops/istft.py,
ops/griffinlim.py pick this backend via ``fft_backend`` flags.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

PREC = jax.lax.Precision.HIGHEST


# Measured split overrides (benchmarks/exp_ct_split.py). At the flagship
# N=4096 the 32x128 split (full 128-wide MXU contraction in the length-n2
# stage) beat the most-square 64x64 by +3.6/+4.6/+5.9% median in three
# consecutive interleaved races on 2026-08-19 (~11/12 pairwise; an earlier
# single 5-round race on a noisier day read 0.975 — superseded by the
# repeated consistent result). Numerics of every split are pinned exact by
# tests/test_mxu_fft.py, so the override is quality-neutral.
_SPLIT_OVERRIDES = {4096: (32, 128)}


def _split(n: int) -> tuple[int, int]:
    """Pick N1*N2 = n with both factors <= 128: a measured override when we
    have one, else as square as possible."""
    if n in _SPLIT_OVERRIDES:
        return _SPLIT_OVERRIDES[n]
    best = None
    r = int(math.isqrt(n))
    for n1 in range(min(128, n), 0, -1):
        if n % n1 == 0 and n // n1 <= 128:
            n2 = n // n1
            score = abs(n1 - r) + abs(n2 - r)
            if best is None or score < best[0]:
                best = (score, n1, n2)
    if best is None:
        raise ValueError(f"no MXU split for N={n}")
    return best[1], best[2]


@functools.lru_cache(maxsize=8)
def _fwd_consts_np(n: int):
    n1, n2 = _split(n)
    a2 = np.arange(n2)
    w2 = np.exp(-2j * np.pi * np.outer(a2, a2) / n2)          # [n2, k1]
    tw = np.exp(-2j * np.pi * np.outer(np.arange(n1), a2) / n)  # [n1, k1]
    k2max = (n // 2) // n2 + 1
    w1 = np.exp(-2j * np.pi * np.outer(np.arange(n1),
                                       np.arange(k2max)) / n1)  # [n1, k2]
    return n1, n2, w2, tw, w1


@functools.lru_cache(maxsize=8)
def _inv_consts_np(n: int):
    n1, n2 = _split(n)
    a2 = np.arange(n2)
    w2 = np.exp(2j * np.pi * np.outer(a2, a2) / n2) / n        # [k1, n2] (1/N folded)
    tw = np.exp(2j * np.pi * np.outer(np.arange(n1), a2) / n)   # [n1, k1]
    w1 = np.exp(2j * np.pi * np.outer(np.arange(n1),
                                      np.arange(n1)) / n1)      # [n1, k2]
    return n1, n2, w2, tw, w1


def _as_planes(consts, dtype=jnp.float32):
    """numpy complex matrices -> (re, im) jnp constant pairs (built fresh per
    trace — caching jnp arrays across traces would leak tracers)."""
    n1, n2, w2, tw, w1 = consts
    c = lambda m: (jnp.asarray(m.real, dtype), jnp.asarray(m.imag, dtype))
    return n1, n2, c(w2), c(tw), c(w1)


def _fwd_consts(n: int, dtype=jnp.float32):
    return _as_planes(_fwd_consts_np(n), dtype)


def _inv_consts(n: int, dtype=jnp.float32):
    return _as_planes(_inv_consts_np(n), dtype)


def supported(n: int) -> bool:
    try:
        _split(n)
        return True
    except ValueError:
        return False


def rfft(x: jax.Array, n: int, precision=None
         ) -> tuple[jax.Array, jax.Array]:
    """Real [..., n] -> (re, im) each [..., n//2 + 1].

    precision: matmul precision override (None -> PREC). DEFAULT (bf16) is
    ~3e-3 relative — fine where the consumer is noise-tolerant (e.g. the
    interior Griffin-Lim iterations), ruinous after log() on quiet bins.
    """
    PREC = precision if precision is not None else globals()["PREC"]
    n1, n2, (w2r, w2i), (twr, twi), (w1r, w1i) = _fwd_consts(n, x.dtype)
    lead = x.shape[:-1]
    xm = x.reshape(lead + (n2, n1)).swapaxes(-1, -2)           # [.., n1, n2]
    yr = jnp.matmul(xm, w2r, precision=PREC)
    yi = jnp.matmul(xm, w2i, precision=PREC)
    zr = yr * twr - yi * twi
    zi = yr * twi + yi * twr
    # stage 3 over n1: out[k2, k1]
    xr = (jnp.matmul(w1r.T, zr, precision=PREC)
          - jnp.matmul(w1i.T, zi, precision=PREC))
    xi = (jnp.matmul(w1r.T, zi, precision=PREC)
          + jnp.matmul(w1i.T, zr, precision=PREC))
    half = n // 2 + 1
    return (xr.reshape(lead + (-1,))[..., :half],
            xi.reshape(lead + (-1,))[..., :half])


def rfft_mag(x: jax.Array, n: int, precision=None) -> jax.Array:
    """Real [..., n] -> |rfft| [..., n//2 + 1] with no complex materialized."""
    re, im = rfft(x, n, precision)
    return jnp.sqrt(re * re + im * im)


def _full_from_half(re_h: jax.Array, im_h: jax.Array, n: int
                    ) -> tuple[jax.Array, jax.Array]:
    """Hermitian extension: half-spectrum [..., n/2+1] -> full [..., n]."""
    re = jnp.concatenate([re_h, re_h[..., -2:0:-1]], axis=-1)
    im = jnp.concatenate([im_h, -im_h[..., -2:0:-1]], axis=-1)
    return re, im


def irfft(re_h: jax.Array, im_h: jax.Array, n: int,
          precision=None) -> jax.Array:
    """(re, im) half-spectrum [..., n//2+1] -> real signal [..., n].

    Matches ``jnp.fft.irfft(re + i*im, n)``: the Hermitian extension uses the
    given bins for k in [0, n/2]; DC/Nyquist imaginary parts drop out of the
    real output by construction.

    Derivation (k = k1 + N2*k2 matching the forward output order; conjugate
    twiddles; 1/N folded into the last-stage matrix):
      A[n1, k1] = sum_{k2} M[k2, k1] * Wc_{N1}^{n1 k2}
      B[n1, k1] = A[n1, k1] * Wc_N^{n1 k1}
      x[n1 + N1*n2] = Re( sum_{k1} B[n1, k1] * Wc_{N2}^{k1 n2} ) / N
    """
    PREC = precision if precision is not None else globals()["PREC"]
    n1, n2, (w2r, w2i), (twr, twi), (w1r, w1i) = _inv_consts(n, re_h.dtype)
    re, im = _full_from_half(re_h, im_h, n)
    lead = re.shape[:-1]
    # k = k1 + N2*k2: slow index k2 -> reshape to [k2, k1]
    xr = re.reshape(lead + (n1, n2))
    xi = im.reshape(lead + (n1, n2))
    # stage 1 over k2: A = W1c @ M  ([n1, k2] @ [.., k2, k1])
    ar = (jnp.matmul(w1r, xr, precision=PREC)
          - jnp.matmul(w1i, xi, precision=PREC))
    ai = (jnp.matmul(w1r, xi, precision=PREC)
          + jnp.matmul(w1i, xr, precision=PREC))
    # stage 2: conjugate twiddle [n1, k1]
    br = ar * twr - ai * twi
    bi = ar * twi + ai * twr
    # stage 3 over k1 (real part only): out[n1, n2] = Re(B @ W2c)
    outr = (jnp.matmul(br, w2r, precision=PREC)
            - jnp.matmul(bi, w2i, precision=PREC))
    # n = n1 + N1*n2: slow index n2 -> transpose to [n2, n1], flatten
    return outr.swapaxes(-1, -2).reshape(lead + (n,))

# The round-1 packed (even/odd) real-FFT alternates were removed in round 2:
# measured slower than the direct path (relayouts eat the MAC savings), and
# the bandwidth-reduction role is now filled by the single-matmul DFT
# backend (ops/dft_mm.py). History: commit ead8e4b^.
