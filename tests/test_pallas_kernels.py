"""Pallas fused-kernel parity (interpret mode on CPU).

The fused mel kernel's TPU numerics were verified on hardware against the
CPU float32 reference (max abs log-mel err 4e-4); here interpret mode pins
the kernel semantics in CI.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gomel_tpu.core.filterbank import mel_weights
from gomel_tpu.ops.mel_ops import mel_encode
from gomel_tpu.ops.pallas.mel_kernel import mel_encode_fused, supported
from gomel_tpu.ops.stft import hann_window


def test_supported_geometries():
    assert supported(4096, 1280)      # flagship CLI config
    assert supported(512, 128)
    assert not supported(4096, 1000)  # hop not divisible by 128
    assert not supported(100, 128)


@pytest.mark.parametrize("block_f", [4, 8])
def test_fused_matches_graph_path(block_f):
    fl, hop, M = 512, 128, 24
    w = jnp.asarray(mel_weights(fl // 2, M, 0.0, 8000.0), jnp.float32)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, fl + 37 * hop)).astype(np.float32)
    got = np.asarray(mel_encode_fused(
        jnp.asarray(x), w, M, fl, hop, block_f=block_f, interpret=True))
    win = jnp.asarray(hann_window(fl), jnp.float32)
    want = np.asarray(jax.vmap(
        lambda s: mel_encode(s, M, fl, hop, w, win, "xla"))(jnp.asarray(x)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_fused_frame_padding_sliced():
    # frame count not a multiple of block_f: extra frames must be sliced off
    fl, hop, M = 512, 128, 16
    w = jnp.asarray(mel_weights(fl // 2, M, 0.0, 8000.0), jnp.float32)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, fl + 13 * hop)),
                    jnp.float32)
    out = mel_encode_fused(x, w, M, fl, hop, block_f=8, interpret=True)
    assert out.shape == (1, 14, M, 2)
