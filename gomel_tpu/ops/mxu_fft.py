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


def _split(n: int) -> tuple[int, int]:
    """Pick N1*N2 = n with both factors <= 128 and as square as possible."""
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


# ---------------------------------------------------------------------------
# Packed real FFT: N-point real transform via an N/2-point complex transform
# (the classic even/odd packing). Measured on TPU v5e: NOT faster than the
# direct path above (forward 7.9 vs 5.6 ms, inverse 8.2 vs 8.7 ms per 8976
# frames) — the halved matmul MACs are eaten by the strided even/odd repack,
# lane flips, and the smaller-K complex stages. Kept as validated alternates;
# the direct transforms remain the defaults.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def _cfft_consts_np(n: int, inverse: bool):
    """Full-output complex DFT stage matrices for length n (k = k1 + N2*k2)."""
    n1, n2 = _split(n)
    sign = 2j if inverse else -2j
    a2 = np.arange(n2)
    w2 = np.exp(sign * np.pi * np.outer(a2, a2) / n2)            # [n2, k1]
    tw = np.exp(sign * np.pi * np.outer(np.arange(n1), a2) / n)   # [n1, k1]
    w1 = np.exp(sign * np.pi * np.outer(np.arange(n1),
                                        np.arange(n1)) / n1)      # [n1, k2]
    if inverse:
        w2 = w2 / n   # fold 1/n into one stage
    return n1, n2, w2, tw, w1


@functools.lru_cache(maxsize=16)
def _butterfly_consts_np(n: int):
    """Twiddles e^{-2pi i k / n} for k = 0..n/2 (forward butterfly)."""
    k = np.arange(n // 2 + 1)
    w = np.exp(-2j * np.pi * k / n)
    return w


def _cfft(zr: jax.Array, zi: jax.Array, n: int, inverse: bool,
          precision=None) -> tuple[jax.Array, jax.Array]:
    """Complex [..., n] -> complex [..., n] DFT/IDFT in real planes."""
    prec = precision if precision is not None else PREC
    n1, n2, w2, tw, w1 = _cfft_consts_np(n, inverse)
    c = lambda m: (jnp.asarray(m.real, zr.dtype), jnp.asarray(m.imag, zr.dtype))
    (w2r, w2i), (twr, twi), (w1r, w1i) = c(w2), c(tw), c(w1)
    lead = zr.shape[:-1]
    xr = zr.reshape(lead + (n2, n1)).swapaxes(-1, -2)   # [.., n1, n2]
    xi = zi.reshape(lead + (n2, n1)).swapaxes(-1, -2)
    # stage 1 over n2 (complex x complex: 4 real matmuls)
    yr = (jnp.matmul(xr, w2r, precision=prec)
          - jnp.matmul(xi, w2i, precision=prec))
    yi = (jnp.matmul(xr, w2i, precision=prec)
          + jnp.matmul(xi, w2r, precision=prec))
    zr2 = yr * twr - yi * twi
    zi2 = yr * twi + yi * twr
    # stage 3 over n1 -> [.., k2, k1]
    or_ = (jnp.matmul(w1r.T, zr2, precision=prec)
           - jnp.matmul(w1i.T, zi2, precision=prec))
    oi_ = (jnp.matmul(w1r.T, zi2, precision=prec)
           + jnp.matmul(w1i.T, zr2, precision=prec))
    return or_.reshape(lead + (n,)), oi_.reshape(lead + (n,))


def packed_supported(n: int) -> bool:
    return n % 2 == 0 and supported(n // 2)


def rfft_packed(x: jax.Array, n: int, precision=None
                ) -> tuple[jax.Array, jax.Array]:
    """Real [..., n] -> (re, im) [..., n//2+1] via an n/2 complex FFT.

    z[m] = x[2m] + i*x[2m+1]; Z = DFT_{n/2}(z);
    A[k] = (Z[k]+conj(Z[M-k]))/2, B[k] = (Z[k]-conj(Z[M-k]))/(2i);
    X[k] = A[k] + W_n^k * B[k], k = 0..M (indices mod M).
    """
    m = n // 2
    lead = x.shape[:-1]
    pairs = x.reshape(lead + (m, 2))
    zr, zi = pairs[..., 0], pairs[..., 1]
    Zr, Zi = _cfft(zr, zi, m, inverse=False, precision=precision)
    # extend with the wrapped k=M term so flips cover k = 0..M
    Zr = jnp.concatenate([Zr, Zr[..., :1]], axis=-1)   # [.., M+1]
    Zi = jnp.concatenate([Zi, Zi[..., :1]], axis=-1)
    Zr_rev = jnp.flip(Zr, axis=-1)                      # Z[M-k]
    Zi_rev = jnp.flip(Zi, axis=-1)
    ar = 0.5 * (Zr + Zr_rev)
    ai = 0.5 * (Zi - Zi_rev)
    br = 0.5 * (Zi + Zi_rev)
    bi = -0.5 * (Zr - Zr_rev)
    w = _butterfly_consts_np(n)
    wr = jnp.asarray(w.real, x.dtype)
    wi = jnp.asarray(w.imag, x.dtype)
    re = ar + wr * br - wi * bi
    im = ai + wr * bi + wi * br
    return re, im


def irfft_packed(re_h: jax.Array, im_h: jax.Array, n: int,
                 precision=None) -> jax.Array:
    """(re, im) half-spectrum [..., n//2+1] -> real [..., n] via an n/2
    complex IDFT (inverse of ``rfft_packed``; DC/Nyquist imaginary parts are
    dropped to match ``jnp.fft.irfft`` semantics)."""
    m = n // 2
    # enforce Hermitian endpoint semantics
    im_h = im_h.at[..., 0].set(0.0).at[..., -1].set(0.0)
    xr_rev = jnp.flip(re_h, axis=-1)          # X[M-k], k = 0..M
    xi_rev = jnp.flip(im_h, axis=-1)
    # A = (X + conj(Xrev))/2 ; WB = (X - conj(Xrev))/2 ; B = conj(W) * WB
    ar = 0.5 * (re_h + xr_rev)
    ai = 0.5 * (im_h - xi_rev)
    wbr = 0.5 * (re_h - xr_rev)
    wbi = 0.5 * (im_h + xi_rev)
    w = _butterfly_consts_np(n)
    wr = jnp.asarray(w.real, re_h.dtype)
    wi = jnp.asarray(w.imag, re_h.dtype)
    br = wr * wbr + wi * wbi                   # conj(W) * WB
    bi = wr * wbi - wi * wbr
    # Z = A + i*B, k = 0..M-1
    zr = (ar - bi)[..., :m]
    zi = (ai + br)[..., :m]
    or_, oi_ = _cfft(zr, zi, m, inverse=True, precision=precision)
    lead = re_h.shape[:-1]
    return jnp.stack([or_, oi_], axis=-1).reshape(lead + (n,))
