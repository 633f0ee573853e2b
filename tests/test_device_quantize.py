"""Device-fused PNG quantization (ops/quantize.py) vs the host quantizer.

The fused path must produce byte-near images (<=1 quantization step, rare
flips from f32-vs-f64 trunc boundaries), identical metadata, and readable
files — the readers can't tell which writer produced an image.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from gomel_tpu.io import imagecodec
from gomel_tpu.io.pngcodec import read_png
from gomel_tpu.ops.quantize import quantize_planes, quantize_mel_plane
from gomel_tpu.pipelines.phase import Phase


def _audio(secs=1.5, sr=48000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(secs * sr)) / sr
    return (0.5 * np.sin(2 * np.pi * 220 * t)
            + 0.05 * rng.standard_normal(t.shape))


@pytest.mark.parametrize("hdr,ihs,layout", [
    (False, True, "go"), (False, False, "py"),
    (True, False, "go"), (True, False, "py"),
])
def test_device_vs_host_bytes(tmp_path, hdr, ihs, layout):
    buf = _audio()
    host = Phase(sample_rate=48000, hdr=hdr, ihs=ihs,
                 metadata_layout=layout)
    dev = Phase(sample_rate=48000, hdr=hdr, ihs=ihs,
                metadata_layout=layout, device_quantize=True)
    p_host = str(tmp_path / "host.png")
    p_dev = str(tmp_path / "dev.png")
    from gomel_tpu.io.audio import save_wav
    wav = str(tmp_path / "in.wav")
    save_wav(wav, buf, 48000)
    host.to_phase_wav(wav, p_host)
    dev.to_phase_wav(wav, p_dev)

    a, b = read_png(p_host), read_png(p_dev)
    assert a.shape == b.shape and a.dtype == b.dtype
    # quantized planes: off by at most one step, and rarely
    diff = np.abs(a.astype(np.int64) - b.astype(np.int64))
    max_step = 1 if not hdr else 2  # 16-bit: f32 has ~2^-23 ulp at 65535
    # the derived B channel wraps, so -1 vs 0 shows as max_val — measure
    # wrap-aware distance
    max_val = 65535 if hdr else 255
    diff = np.minimum(diff, (max_val + 1) - diff)
    assert diff.max() <= max_step, f"max pixel diff {diff.max()}"
    assert (diff > 0).mean() < 2e-3

    # metadata + decoded content agree (the real contract)
    sa = imagecodec.load_phase_image(p_host, True, 2 if ihs else 0, hdr,
                                     layout=layout)
    sb = imagecodec.load_phase_image(p_dev, True, 2 if ihs else 0, hdr,
                                     layout=layout)
    assert sa[1] == pytest.approx(sb[1])  # samples
    assert sa[2] == pytest.approx(sb[2])  # sr
    assert sa[3] == sb[3]                 # num_freqs
    scale = max(1e-12, float(np.abs(sa[0]).max()))
    assert np.abs(sa[0] - sb[0]).max() / scale < (1e-2 if hdr else 2e-2)


def test_quantize_planes_matches_host_quantizer():
    rng = np.random.default_rng(1)
    spec = rng.standard_normal((37, 64, 2)) * 3.0
    img2, maxs, mins = quantize_planes(jnp.asarray(spec, jnp.float32), 255, 2)
    img2 = np.asarray(img2)
    # host reference on the same f32 values (isolates layout/trunc logic
    # from f32-vs-f64 normalization noise)
    s = np.arcsinh(np.arcsinh(spec.astype(np.float32)))
    hx, hn = s.max(axis=(0, 1)), s.min(axis=(0, 1))
    norm = (s - hn) / (hx - hn)
    host = np.clip(np.trunc(255 * norm), 0, 255).astype(np.uint8)
    np.testing.assert_allclose(np.asarray(maxs), hx, rtol=1e-6)
    mismatch = (img2 != host.transpose(1, 0, 2)).mean()
    assert mismatch < 2e-3, mismatch


def test_quantize_planes_degenerate_channel():
    spec = np.zeros((5, 8, 2), np.float32)
    spec[:, :, 1] = np.linspace(0, 1, 40).reshape(5, 8)
    img2, maxs, mins = quantize_planes(jnp.asarray(spec), 255, 0)
    img2 = np.asarray(img2)
    assert (img2[:, :, 0] == 127).all()  # norm pinned at 0.5 -> trunc 127
    assert img2[:, :, 1].min() == 0 and img2[:, :, 1].max() == 255


def test_quantize_mel_plane_global_minmax():
    rng = np.random.default_rng(2)
    spec = rng.standard_normal((23, 48, 2)).astype(np.float32)
    img2, mx, mn = quantize_mel_plane(jnp.asarray(spec))
    assert float(mx) == pytest.approx(spec.max(), rel=1e-6)
    host_norm = (spec - spec.min()) / (spec.max() - spec.min())
    host = np.clip(np.trunc(255 * host_norm), 0, 255).astype(np.uint8)
    assert (np.asarray(img2) != host.transpose(1, 0, 2)).mean() < 2e-3


def test_device_quantized_roundtrip(tmp_path):
    """Full WAV -> PNG (device quantize) -> WAV: same reconstruction
    quality contract as the host path."""
    from gomel_tpu.io.audio import save_wav, load_wav
    buf = _audio(secs=2.0)
    wav = str(tmp_path / "in.wav")
    png = str(tmp_path / "p.png")
    out = str(tmp_path / "out.wav")
    save_wav(wav, buf, 48000)
    Phase(sample_rate=48000, device_quantize=True).to_phase_wav(wav, png)
    Phase(sample_rate=48000).to_wav_png(png, out)
    rec, _ = load_wav(out)
    n = min(len(rec), len(buf))
    corr = np.corrcoef(buf[4096:n - 4096], rec[4096:n - 4096])[0, 1]
    assert corr > 0.99, corr


@pytest.mark.parametrize("hdr,ihs", [(False, True), (True, False)])
def test_device_dequantize_decode_matches_host(tmp_path, hdr, ihs):
    """to_wav_png with device_quantize uploads integer planes and fuses
    rescale + sinh undo + decode; the written WAV must match the host
    de-quantization path within PCM-16 rounding."""
    from gomel_tpu.io.audio import save_wav, load_wav
    buf = _audio(secs=1.5, seed=4)
    wav = str(tmp_path / "in.wav")
    png = str(tmp_path / "p.png")
    save_wav(wav, buf, 48000)
    Phase(sample_rate=48000, hdr=hdr, ihs=ihs).to_phase_wav(wav, png)
    out_h = str(tmp_path / "h.wav")
    out_d = str(tmp_path / "d.wav")
    Phase(sample_rate=48000, hdr=hdr, ihs=ihs).to_wav_png(png, out_h)
    Phase(sample_rate=48000, hdr=hdr, ihs=ihs,
          device_quantize=True).to_wav_png(png, out_d)
    a, _ = load_wav(out_h)
    b, _ = load_wav(out_d)
    assert a.shape == b.shape
    # f32-vs-f64 de-quantization noise under PCM-16: at most 1 LSB; the
    # double-sinh IHS undo amplifies f32 noise enough that a few percent
    # of samples sit on a rounding boundary
    lsb = np.abs(a - b) * 32768.0
    assert lsb.max() <= 1.0 + 1e-9
    assert (lsb > 0.5).mean() < 5e-2


def test_load_phase_image_raw_consistent(tmp_path):
    """raw loader returns exactly the planes/extrema that reproduce the
    host loader's spectrogram."""
    buf = _audio(secs=1.0, seed=5)
    from gomel_tpu.io.audio import save_wav
    wav = str(tmp_path / "in.wav")
    png = str(tmp_path / "p.png")
    save_wav(wav, buf, 48000)
    Phase(sample_rate=48000).to_phase_wav(wav, png)
    spec, samples, sr, nf = imagecodec.load_phase_image(png, True, 2, False)
    planes, maxs, mins, samples2, sr2, nf2 = \
        imagecodec.load_phase_image_raw(png, True, False)
    assert (samples, sr, nf) == (samples2, sr2, nf2)
    re = planes.astype(np.float64).transpose(1, 0, 2) / 255.0
    re = re * (maxs - mins) + mins
    re = np.sinh(np.sinh(re))
    np.testing.assert_allclose(re, spec, rtol=0, atol=1e-12)


def test_pcm16_device_conversion_bit_identical(tmp_path):
    """The fused PCM-16 conversion (ops/quantize.pcm16_encode, used by the
    device-quantize to_wav_png readback) is BIT-identical to save_wav's
    host float64 conversion of the same device float wave — *32768 is an
    exact power-of-two scale, so rint sees the same value either way."""
    buf = _audio(secs=1.2, seed=9)
    from gomel_tpu.io.audio import save_wav
    wav = str(tmp_path / "in.wav")
    png = str(tmp_path / "p.png")
    save_wav(wav, buf, 48000)
    p = Phase(sample_rate=48000, device_quantize=True)
    p.to_phase_wav(wav, png)
    planes, maxs, mins, *_ = imagecodec.load_phase_image_raw(png, True, False)
    x = np.asarray(p.decode_quantized(planes, maxs, mins))
    host_pcm = np.clip(np.rint(np.clip(x.astype(np.float64), -1, 1)
                               * 32768.0), -32768, 32767).astype(np.int16)
    dev_pcm, finite = p.decode_quantized_pcm16(planes, maxs, mins)
    assert bool(finite)
    np.testing.assert_array_equal(np.asarray(dev_pcm), host_pcm)


def test_pcm16_nonfinite_flag():
    """pcm16_encode's finite flag preserves save_wav's NaN/Inf contract."""
    import jax.numpy as jnp
    from gomel_tpu.ops.quantize import pcm16_encode
    pcm, ok = pcm16_encode(jnp.asarray([0.1, -0.2, 0.3], jnp.float32))
    assert bool(ok) and np.asarray(pcm).dtype == np.int16
    _, bad = pcm16_encode(jnp.asarray([0.1, np.nan], jnp.float32))
    assert not bool(bad)


def test_pcm16_ingest_bit_identical_to_float_ingest(tmp_path):
    """The int16-ingest encode program (conversion + stereo mean + upsample
    on device) writes the byte-IDENTICAL PNG as the float-ingest device
    path — /32768 is an exact power-of-two scale and the zero-stuff boost
    is a small-integer multiply, so the f32 signals agree bitwise."""
    from gomel_tpu.io.audio import save_wav, load_wav, load_wav_pcm16
    buf = _audio(secs=1.0, seed=11)
    wav = str(tmp_path / "in.wav")
    save_wav(wav, buf, 24000)  # 24 kHz: exercises the device upsample
    p = Phase(sample_rate=24000, device_quantize=True)
    f_pcm = str(tmp_path / "pcm.png")
    f_flt = str(tmp_path / "flt.png")
    pcm, sr = load_wav_pcm16(wav, mono="left")
    p._encode_file_pcm(pcm, sr, f_pcm)
    flt, _ = load_wav(wav, mono="left")
    p._encode_file(flt, sr, f_flt)
    assert open(f_pcm, "rb").read() == open(f_flt, "rb").read()


def test_flac_pcm16_ingest_device_vs_host(tmp_path):
    """FLAC file encode through the int16-ingest fused program vs the host
    path: byte-near PNG (<=1 step), identical metadata — for both codecs
    (phase 1/32768 and mel 1/65536 scalings are powers of two, exact on
    device)."""
    from gomel_tpu.io.flac import write_flac
    from gomel_tpu.pipelines.mel import Mel
    from gomel_tpu.core.config import MelConfig
    buf = _audio(secs=0.8, sr=48000, seed=13)
    pcm = np.clip(np.rint(buf * 32767), -32768, 32767).astype(np.int16)
    f = str(tmp_path / "in.flac")
    write_flac(f, pcm, 48000)

    p_h = str(tmp_path / "ph.png")
    p_d = str(tmp_path / "pd.png")
    Phase(sample_rate=48000).to_phase_flac(f, p_h)
    Phase(sample_rate=48000, device_quantize=True).to_phase_flac(f, p_d)
    from gomel_tpu.io.pngcodec import read_png
    a, b = read_png(p_h), read_png(p_d)
    assert a.shape == b.shape
    diff = np.abs(a.astype(np.int64) - b.astype(np.int64))
    diff = np.minimum(diff, 256 - diff)
    assert diff.max() <= 1
    sa = imagecodec.load_phase_image(p_h, True, 0, False)
    sb = imagecodec.load_phase_image(p_d, True, 0, False)
    assert sa[1:] == sb[1:]

    m_h = str(tmp_path / "mh.png")
    m_d = str(tmp_path / "md.png")
    cfg = MelConfig.cli_default()
    Mel(cfg).to_mel_flac(f, m_h)
    Mel(cfg, device_quantize=True).to_mel_flac(f, m_d)
    a, b = read_png(m_h), read_png(m_d)
    assert a.shape == b.shape
    assert np.abs(a.astype(np.int64) - b.astype(np.int64)).max() <= 1
    _, samples_h, sr_h = imagecodec.load_mel_image(m_h, True)
    _, samples_d, sr_d = imagecodec.load_mel_image(m_d, True)
    assert (samples_h, sr_h) == (samples_d, sr_d)
