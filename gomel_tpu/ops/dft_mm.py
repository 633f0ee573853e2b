"""Direct DFT as ONE MXU matmul — the bandwidth-optimal FFT path for
precision-tolerant transforms.

The Cooley-Tukey MXU path (ops/mxu_fft.py) minimizes FLOPs (O(N^1.5) MACs)
but pays ~10 HBM round-trips per transform across its stages, and its small
contraction depths (K = 64) under-fill the 128x128 systolic array. At
DEFAULT/HIGH matmul precision the MXU is so fast that the O(N^2) direct DFT
— a single [F, 2*(N/2+1)] x [2*(N/2+1), N] real matmul with K = N lane-full
contractions — is cheaper end-to-end: one read of the spectrum planes, one
write of the frames, weights streamed once.

Measured on TPU v5 lite (flagship N=4096, 8976 frames, pipelined-slope
methodology, benchmarks/exp_dftmm.py):

| consumer                    | CT-MXU path | direct-mm path |
|---|---|---|
| Griffin-Lim loop (DEFAULT)  | 20.3 ms / 2 iters | 12.1 ms (adopted) |
| direct iSTFT (HIGH)         | 9.9 ms (HIGHEST CT) | 7.5 ms (adopted) |
| direct iSTFT (HIGHEST)      | 9.9 ms | 12.3 ms (6-pass recomputes the O(N^2) MACs — CT wins) |
| encode rfft (HIGHEST)       | 5.1 ms full mel encode | slower, not adopted |

Precision guidance: DEFAULT (bf16, ~1.5e-3 max-rel-err) only where the
consumer is noise-tolerant (Griffin-Lim); HIGH (3-pass, ~1.1e-5) sits below
PCM-16 output quantization (3.1e-5) and is the phase-decode default; encode
paths that feed log() stay on the HIGHEST CT path (see CLAUDE.md).

Replaces go-dsp FFT usage on decode paths (/root/reference/mel/mel.go:76-139,
/root/reference/phase/phase.go:93-133).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Weight matrices are [N, 2*(N/2+1)] fp32; cap N so a cached pair stays
# ~O(100 MB) HBM. Above the cap the CT path (mxu_fft) is used instead.
MAX_N = 8192


def _prec(precision):
    # match mxu_fft semantics: None means f32-equivalent, not bf16
    return precision if precision is not None else jax.lax.Precision.HIGHEST


def supported(n: int) -> bool:
    return n % 2 == 0 and 2 <= n <= MAX_N


@functools.lru_cache(maxsize=4)
def _fwd_np(n: int) -> np.ndarray:
    """[n, 2*(n//2+1)]: x @ W -> [re | im] rfft planes (float64 master)."""
    k = np.arange(n // 2 + 1)
    nn = np.arange(n)
    ang = 2.0 * np.pi * np.outer(nn, k) / n
    return np.concatenate([np.cos(ang), -np.sin(ang)], axis=1)


@functools.lru_cache(maxsize=4)
def _inv_np(n: int) -> np.ndarray:
    """[2*(n//2+1), n]: [re | im] @ W -> real signal, matching
    ``jnp.fft.irfft`` semantics (imag parts of DC/Nyquist ignored)."""
    half = n // 2 + 1
    k = np.arange(half)
    nn = np.arange(n)
    c = np.full(half, 2.0)
    c[0] = 1.0
    c[-1] = 1.0
    ang = 2.0 * np.pi * np.outer(k, nn) / n
    wr = (c[:, None] / n) * np.cos(ang)
    wi = -(c[:, None] / n) * np.sin(ang)
    wi[0] = 0.0   # irfft ignores imag(DC)
    wi[-1] = 0.0  # and imag(Nyquist)
    return np.concatenate([wr, wi], axis=0)


@functools.lru_cache(maxsize=4)
def _fwd_hann_np(n: int) -> np.ndarray:
    from .stft import hann_window
    return _fwd_np(n) * hann_window(n)[:, None]


@functools.lru_cache(maxsize=4)
def _inv_hann_np(n: int) -> np.ndarray:
    from .stft import hann_window
    return _inv_np(n) * hann_window(n)[None, :]


def _fold_fwd(n: int, window_np: np.ndarray) -> np.ndarray:
    from .stft import hann_window
    if window_np is hann_window(n):  # hann_window is lru-cached -> identity
        return _fwd_hann_np(n)
    return _fwd_np(n) * np.asarray(window_np, np.float64)[:, None]


def _fold_inv(n: int, window_np: np.ndarray) -> np.ndarray:
    from .stft import hann_window
    if window_np is hann_window(n):
        return _inv_hann_np(n)
    return _inv_np(n) * np.asarray(window_np, np.float64)[None, :]


def rfft(x: jax.Array, n: int, precision=None
         ) -> tuple[jax.Array, jax.Array]:
    """Real [..., n] -> (re, im) half-spectrum planes [..., n//2+1]."""
    w = jnp.asarray(_fwd_np(n), x.dtype)
    out = jnp.matmul(x, w, precision=_prec(precision))
    half = n // 2 + 1
    return out[..., :half], out[..., half:]


def rfft_windowed(x: jax.Array, n: int, window_np: np.ndarray,
                  precision=None) -> tuple[jax.Array, jax.Array]:
    """rfft of ``x * window`` with the (host-side) window FOLDED into the
    weight matrix — the analysis-window multiply costs ~4 ms per 240
    audio-seconds as a separate XLA pass at the flagship config (it breaks
    fusion into the matmul); folding makes it free."""
    w = jnp.asarray(_fold_fwd(n, window_np), x.dtype)
    out = jnp.matmul(x, w, precision=_prec(precision))
    half = n // 2 + 1
    return out[..., :half], out[..., half:]


def irfft_windowed(re_h: jax.Array, im_h: jax.Array, n: int,
                   window_np: np.ndarray, precision=None) -> jax.Array:
    """``irfft(re, im) * window`` with the synthesis window folded into the
    weight matrix (see ``rfft_windowed``)."""
    w = jnp.asarray(_fold_inv(n, window_np), re_h.dtype)
    z = jnp.concatenate([re_h, im_h], axis=-1)
    return jnp.matmul(z, w, precision=_prec(precision))


def rfft_mag(x: jax.Array, n: int, precision=None) -> jax.Array:
    re, im = rfft(x, n, precision)
    return jnp.sqrt(re * re + im * im)


def irfft(re_h: jax.Array, im_h: jax.Array, n: int,
          precision=None) -> jax.Array:
    """(re, im) half-spectrum [..., n//2+1] -> real signal [..., n]."""
    w = jnp.asarray(_inv_np(n), re_h.dtype)
    z = jnp.concatenate([re_h, im_h], axis=-1)
    return jnp.matmul(z, w, precision=_prec(precision))
