"""STFT / iSTFT op tests against plain numpy oracles."""
import conftest  # noqa: F401

import numpy as np
import jax.numpy as jnp
import pytest

from gomel_tpu.ops.stft import frame_signal, hann_window, stft
from gomel_tpu.ops.istft import istft_direct, overlap_add, window_sum


def test_hann_matches_numpy():
    np.testing.assert_allclose(hann_window(4096), np.hanning(4096), atol=0)
    np.testing.assert_allclose(hann_window(256), np.hanning(256), atol=0)


@pytest.mark.parametrize("L,N,hop", [(19199, 4096, 1280), (8000, 2048, 256),
                                     (5000, 1024, 1000)])
def test_frame_signal_matches_strided(L, N, hop):
    rng = np.random.RandomState(0)
    x = rng.randn(L)
    F = (L - N) // hop + 1
    idx = np.arange(N)[None, :] + np.arange(F)[:, None] * hop
    expect = x[idx]
    got = np.asarray(frame_signal(jnp.asarray(x), N, hop))
    np.testing.assert_array_equal(got, expect)


def test_stft_matches_full_fft_oracle():
    """The rfft half-spectrum must equal the reference's full-FFT bins
    (vectorized port semantics, phase.py:119-127)."""
    rng = np.random.RandomState(1)
    L, N, hop = 19199, 4096, 1280
    x = rng.randn(L)
    F = (L - N) // hop + 1
    idx = np.arange(N)[None, :] + np.arange(F)[:, None] * hop
    frames = x[idx] * np.hanning(N)
    full = np.fft.fft(frames, axis=1)
    got = np.asarray(stft(jnp.asarray(x), N, hop))
    np.testing.assert_allclose(got, full[:, : N // 2 + 1], rtol=1e-9, atol=1e-9)
    # conjugate symmetry: bin N-j-1 == conj(bin j+1)
    j = np.arange(N // 2)
    np.testing.assert_allclose(full[:, N - j - 1], np.conj(full[:, j + 1]),
                               rtol=1e-9, atol=1e-9)


def test_overlap_add_matches_scalar():
    rng = np.random.RandomState(2)
    F, N, hop = 7, 1024, 300
    frames = rng.randn(F, N)
    expect = np.zeros(N + (F - 1) * hop)
    for i in range(F):
        expect[i * hop: i * hop + N] += frames[i]
    got = np.asarray(overlap_add(jnp.asarray(frames), hop))
    np.testing.assert_allclose(got, expect, rtol=1e-12, atol=1e-12)


def test_window_sum_matches_scalar():
    F, N, hop = 12, 4096, 1280
    w = np.hanning(N)
    expect = np.zeros(N + (F - 1) * hop)
    for i in range(F):
        expect[i * hop: i * hop + N] += w * w
    got = np.asarray(window_sum(jnp.asarray(w), F, hop))
    np.testing.assert_allclose(got, expect, rtol=1e-12, atol=1e-12)


def test_istft_direct_matches_scalar_oracle():
    """Literal transcription of the phase ISTFT (phase/phase.go:93-133)."""
    rng = np.random.RandomState(3)
    F, N, hop = 13, 2048, 640
    w = np.hanning(N)
    # random Hermitian-compatible half spectrum
    half = rng.randn(F, N // 2 + 1) + 1j * rng.randn(F, N // 2 + 1)
    half[:, 0] = 0.0
    half[:, -1] = half[:, -1].real

    out_len = N + (F - 1) * hop
    sig = np.zeros(out_len)
    wsum = np.zeros(out_len)
    for i in range(F):
        td = np.fft.irfft(half[i], n=N)
        sig[i * hop: i * hop + N] += td * w
        wsum[i * hop: i * hop + N] += w * w
    thr = wsum.max() * 0.5
    expect = sig.copy()
    for n in range(out_len):
        if wsum[n] > thr:
            expect[n] = sig[n] / wsum[n]
        elif wsum[n] > 1e-21:
            expect[n] = sig[n] / wsum[n] * (wsum[n] / thr)

    got = np.asarray(istft_direct(jnp.asarray(half), hop, jnp.asarray(w)))
    np.testing.assert_allclose(got, expect, rtol=1e-10, atol=1e-12)


def test_map_frame_chunks_matches_flat():
    """Chunked analysis (lax.map over frame chunks) must equal the flat
    kernel to float ulps on the real frames (shape-dependent XLA codegen
    reorders reductions at the 1e-6 relative level), for chunk sizes that
    divide, exceed, and straddle the frame count."""
    import jax.numpy as jnp
    from gomel_tpu.core.filterbank import mel_weights
    from gomel_tpu.ops.mel_ops import mel_encode
    from gomel_tpu.ops.phase_ops import phase_encode

    fl, hop = 256, 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(fl + 53 * hop), jnp.float32)  # F=54
    w = jnp.asarray(mel_weights(fl // 2, 24, 0.0, 8000.0), jnp.float32)
    flat = np.asarray(mel_encode(x, 24, fl, hop, w))
    for chunk in (1, 7, 16, 54, 64, 200):
        got = np.asarray(mel_encode(x, 24, fl, hop, w, frame_chunk=chunk))
        np.testing.assert_allclose(got, flat, rtol=2e-5, atol=2e-5), chunk
    pflat = np.asarray(phase_encode(x, 96, fl, hop))
    for chunk in (7, 54, 200):
        got = np.asarray(phase_encode(x, 96, fl, hop, frame_chunk=chunk))
        np.testing.assert_allclose(got, pflat, rtol=2e-5, atol=2e-5), chunk


def test_auto_frame_chunk_policy():
    from gomel_tpu.ops.stft import auto_frame_chunk
    assert auto_frame_chunk(1122) is None     # serving shape: no chunking
    assert auto_frame_chunk(3072) == 1024     # long-form: chunked
    assert auto_frame_chunk(67497) == 1024


def test_chunked_synthesis_matches_flat():
    """chunked_irfft_overlap_add (scan with tail carry) must match the flat
    irfft+overlap_add synthesis to float ulps, with and without a frame
    mask."""
    import jax
    import jax.numpy as jnp
    from gomel_tpu.ops.istft import (chunked_irfft_overlap_add, overlap_add,
                                     istft_direct_planes)
    from gomel_tpu.ops.fftbackend import irfft_planes
    from gomel_tpu.ops.stft import hann_window

    fl, hop, F = 256, 64, 53
    rng = np.random.default_rng(4)
    re = jnp.asarray(rng.standard_normal((F, fl // 2 + 1)), jnp.float32)
    im = jnp.asarray(rng.standard_normal((F, fl // 2 + 1)), jnp.float32)
    win = jnp.asarray(hann_window(fl), jnp.float32)
    flat = np.asarray(overlap_add(
        irfft_planes(re, im, fl, "xla").astype(jnp.float32) * win, hop))
    for chunk in (7, 16, 53, 200):
        got = np.asarray(chunked_irfft_overlap_add(re, im, hop, win, chunk))
        np.testing.assert_allclose(got, flat, rtol=2e-5, atol=2e-5), chunk
    # masked frames contribute nothing
    mask = jnp.asarray(rng.random(F) > 0.3)
    masked_flat = np.asarray(overlap_add(
        jnp.where(mask[:, None],
                  irfft_planes(re, im, fl, "xla").astype(jnp.float32) * win,
                  0.0), hop))
    got = np.asarray(chunked_irfft_overlap_add(re, im, hop, win, 16,
                                               frame_mask=mask))
    np.testing.assert_allclose(got, masked_flat, rtol=2e-5, atol=2e-5)
    # full direct iSTFT wrapper parity
    a = np.asarray(istft_direct_planes(re, im, hop, win))
    b = np.asarray(istft_direct_planes(re, im, hop, win, frame_chunk=16))
    np.testing.assert_allclose(b, a, rtol=2e-5, atol=2e-5)
    # too-small chunk is rejected (tail would span two bodies)
    import pytest
    with pytest.raises(ValueError, match="too small"):
        chunked_irfft_overlap_add(re, im, hop, win, 1)
