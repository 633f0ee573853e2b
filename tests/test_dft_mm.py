"""Parity of the direct-DFT-matmul backend (ops/dft_mm.py).

On CPU (float64, conftest) the mm path must match numpy's FFT to float64
matmul accuracy, and the decode consumers forced through backend="mm" must
match their default-path outputs. TPU speed numbers live in
benchmarks/exp_dftmm.py / RESULTS.md; numerics are pinned here.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gomel_tpu.ops import dft_mm
from gomel_tpu.ops.fftbackend import resolve
from gomel_tpu.ops.griffinlim import griffin_lim
from gomel_tpu.ops.istft import istft_direct_planes
from gomel_tpu.ops.stft import hann_window


@pytest.mark.parametrize("n", [64, 256, 4096])
def test_rfft_matches_numpy(n):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, n))
    re, im = dft_mm.rfft(jnp.asarray(x), n)
    want = np.fft.rfft(x, axis=-1)
    np.testing.assert_allclose(np.asarray(re), want.real, atol=1e-9 * n)
    np.testing.assert_allclose(np.asarray(im), want.imag, atol=1e-9 * n)


@pytest.mark.parametrize("n", [64, 4096])
def test_irfft_matches_numpy(n):
    rng = np.random.default_rng(1)
    half = n // 2 + 1
    re = rng.standard_normal((2, half))
    im = rng.standard_normal((2, half))
    got = dft_mm.irfft(jnp.asarray(re), jnp.asarray(im), n)
    # numpy irfft drops imag(DC)/imag(Nyquist) — same semantics
    want = np.fft.irfft(re + 1j * im, n=n, axis=-1)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-12 * n)


def test_rfft_irfft_roundtrip():
    n = 512
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, n))
    re, im = dft_mm.rfft(jnp.asarray(x), n)
    back = dft_mm.irfft(re, im, n)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-10)


def test_resolve_auto_lowp_on_cpu_is_xla():
    # CPU golden paths must stay on exact FFTs regardless of consumer hints
    assert resolve("auto_lowp", 4096) == "xla"
    assert resolve("mm", 4096) == "mm"


def test_supported_bounds():
    assert dft_mm.supported(4096)
    assert dft_mm.supported(2)
    assert not dft_mm.supported(3)            # odd
    assert not dft_mm.supported(dft_mm.MAX_N * 2)  # weight-size cap


def test_griffin_lim_mm_matches_default():
    """The GL loop through backend='mm' equals the default path (CPU f64)."""
    F, N, hop = 7, 256, 96
    rng = np.random.default_rng(3)
    mag = jnp.asarray(np.abs(rng.standard_normal((F, N // 2 + 1))))
    init = jnp.asarray(rng.uniform(size=(N + (F - 1) * hop,)))
    key = jax.random.PRNGKey(0)
    a = griffin_lim(mag, hop, 3, key, init=init, fft_backend="xla")
    b = griffin_lim(mag, hop, 3, key, init=init, fft_backend="mm")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-8)


def test_istft_direct_mm_matches_default():
    F, N, hop = 9, 512, 160
    rng = np.random.default_rng(4)
    re = jnp.asarray(rng.standard_normal((F, N // 2 + 1)))
    im = jnp.asarray(rng.standard_normal((F, N // 2 + 1)))
    w = jnp.asarray(hann_window(N))
    a = istft_direct_planes(re, im, hop, w, "xla")
    b = istft_direct_planes(re, im, hop, w, "mm")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-8)
