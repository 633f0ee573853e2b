"""Parity of the MXU-matmul FFT (ops/mxu_fft.py) against np.fft.

The mxu backend only engages on TPU ("auto" resolves to xla on CPU), so
without these tests the suite never exercises it. The kernels are plain
matmuls and run fine on CPU when requested explicitly — parity is checked
for the forward rfft, the inverse, and ALL valid factor splits of the
flagship N=4096 (the split choice is a measured perf knob,
benchmarks/exp_ct_split.py, and must never change numerics)."""
import numpy as np
import jax.numpy as jnp
import pytest

from gomel_tpu.ops import mxu_fft


@pytest.mark.parametrize("n", [64, 256, 1024, 4096, 16384])
def test_rfft_matches_numpy(n):
    rng = np.random.default_rng(n)
    x = rng.standard_normal((3, n)).astype(np.float32)
    re, im = mxu_fft.rfft(jnp.asarray(x), n)
    want = np.fft.rfft(x.astype(np.float64), axis=-1)
    scale = np.abs(want).max()
    np.testing.assert_allclose(np.asarray(re), want.real,
                               atol=2e-5 * scale, rtol=0)
    np.testing.assert_allclose(np.asarray(im), want.imag,
                               atol=2e-5 * scale, rtol=0)
    mag = mxu_fft.rfft_mag(jnp.asarray(x), n)
    np.testing.assert_allclose(np.asarray(mag), np.abs(want),
                               atol=2e-5 * scale, rtol=0)


@pytest.mark.parametrize("n", [64, 1024, 4096])
def test_irfft_round_trip(n):
    rng = np.random.default_rng(n + 1)
    x = rng.standard_normal((2, n)).astype(np.float32)
    spec = np.fft.rfft(x, axis=-1)
    got = mxu_fft.irfft(jnp.asarray(spec.real.astype(np.float32)),
                        jnp.asarray(spec.imag.astype(np.float32)), n)
    np.testing.assert_allclose(np.asarray(got), x, atol=2e-5, rtol=0)


def _valid_splits(n):
    return [(n1, n // n1) for n1 in range(1, 129)
            if n % n1 == 0 and n // n1 <= 128]


@pytest.mark.parametrize("split", _valid_splits(4096))
def test_every_4096_split_is_numerically_equivalent(split, monkeypatch):
    """Rectangular factor splits (the perf knob) must be exact: forward
    against np.fft AND inverse round trip, for every valid N1*N2 = 4096."""
    orig = mxu_fft._split
    monkeypatch.setattr(mxu_fft, "_split",
                        lambda n: split if n == 4096 else orig(n))
    mxu_fft._fwd_consts_np.cache_clear()
    mxu_fft._inv_consts_np.cache_clear()
    try:
        n = 4096
        rng = np.random.default_rng(split[0])
        x = rng.standard_normal((2, n)).astype(np.float32)
        re, im = mxu_fft.rfft(jnp.asarray(x), n)
        want = np.fft.rfft(x.astype(np.float64), axis=-1)
        scale = np.abs(want).max()
        np.testing.assert_allclose(np.asarray(re), want.real,
                                   atol=2e-5 * scale, rtol=0)
        np.testing.assert_allclose(np.asarray(im), want.imag,
                                   atol=2e-5 * scale, rtol=0)
        back = mxu_fft.irfft(re, im, n)
        np.testing.assert_allclose(np.asarray(back), x, atol=3e-5 * scale,
                                   rtol=0)
    finally:
        mxu_fft._fwd_consts_np.cache_clear()
        mxu_fft._inv_consts_np.cache_clear()
