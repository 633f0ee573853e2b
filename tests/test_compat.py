"""Compat-layer parity: gomel_tpu.compat.phase vs the reference port.

The reference /root/reference/phase.py is importable (PIL present; soundfile
stubbed by conftest) and serves as the golden oracle for buffer-level and
image-level APIs. File-level audio APIs are covered by our own tests
(the oracle's soundfile is stubbed).
"""
import numpy as np
import pytest

from conftest import load_reference_phase
from gomel_tpu.compat import phase as compat

ref = load_reference_phase()
needs_ref = pytest.mark.skipif(ref is None, reason="reference port unavailable")


def _tone(n=48000, sr=48000, f=440.0):
    t = np.arange(n) / sr
    return (0.5 * np.sin(2 * np.pi * f * t)
            + 0.2 * np.sin(2 * np.pi * 3.7 * f * t)).astype(np.float64)


@needs_ref
def test_to_phase_matches_reference():
    audio = compat.pad(_tone(), 1280)
    ours = compat.Phase(sample_rate=48000).to_phase(audio)
    theirs = ref.Phase(sample_rate=48000).to_phase(audio)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-4)


@needs_ref
def test_from_phase_matches_reference():
    audio = compat.pad(_tone(24000), 1280)
    spec = ref.Phase(sample_rate=48000).to_phase(audio)
    ours = compat.Phase(sample_rate=48000).from_phase(spec)
    theirs = ref.Phase(sample_rate=48000).from_phase(spec)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)


@needs_ref
def test_helpers_match_reference():
    buf = _tone(5000)
    np.testing.assert_array_equal(compat.pad(buf, 64), ref.pad(buf, 64))
    for orig in (100, 959, 960, 961, 15 * 64, 15 * 64 + 1):
        padded = len(ref.pad(np.zeros(orig), 64))
        assert compat.is_padded(orig, padded, 64) == \
            ref.is_padded(orig, padded, 64)
    s = np.abs(np.random.default_rng(0).standard_normal((1024, 2))) - 0.3
    np.testing.assert_allclose(compat.spectral_normalize(s),
                               ref.spectral_normalize(s))
    np.testing.assert_allclose(compat.spectral_denormalize(s),
                               ref.spectral_denormalize(s))
    flat = np.random.default_rng(1).standard_normal((6 * 512, 2))
    np.testing.assert_array_equal(compat.shrink(flat, 1024, 96),
                                  ref.shrink(flat, 1024, 96))
    small = np.random.default_rng(2).standard_normal((6 * 96, 2))
    np.testing.assert_array_equal(compat.grow(small, 1024, 96),
                                  ref.grow(small, 1024, 96))
    up = compat.zero_stuff_upsample(buf, 2, 1)
    np.testing.assert_allclose(up, ref.zero_stuff_upsample(buf, 2, 1))
    for v in (0.0, 1.5, -3.25, 65504.0, 1e-4):
        assert compat.pack_float16_to_bytes(v) == ref.pack_float16_to_bytes(v)
        assert compat.unpack_bytes_to_float64(
            compat.pack_float16_to_bytes(v)) == pytest.approx(
            ref.unpack_bytes_to_float64(ref.pack_float16_to_bytes(v)), rel=1e-3)


@needs_ref
def test_png_cross_compat_ours_to_reference(tmp_path):
    p = compat.Phase(sample_rate=48000)
    audio = compat.pad(_tone(30000), 1280)
    spec = p.to_phase(audio)
    f = str(tmp_path / "ours.png")
    compat.save_image(f, spec, p.num_freqs, 12.3, 48000, True, False, 0)
    their_spec, samples, sr, nf = ref.load_image(f, True, False, 0)
    n_frames = len(spec) // p.num_freqs
    assert nf == p.num_freqs
    assert sr == pytest.approx(48000, rel=1e-2)
    # load_image returns samples_in_mel * stride (phase.py:849)
    assert samples == pytest.approx(12.3 * n_frames, rel=1e-2)
    our_spec, samples2, sr2, nf2 = compat.load_image(f, True, False, 0)
    np.testing.assert_allclose(their_spec, our_spec, atol=1e-9)


@needs_ref
def test_png_cross_compat_reference_to_ours(tmp_path):
    rp = ref.Phase(sample_rate=48000)
    audio = ref.pad(_tone(30000), 1280)
    spec = rp.to_phase(audio)
    f = str(tmp_path / "theirs.png")
    ref.save_image(f, spec, rp.num_freqs, 7.5, 48000, True, False, 0)
    our_spec, samples, sr, nf = compat.load_image(f, True, False, 0)
    their_spec, samples2, sr2, nf2 = ref.load_image(f, True, False, 0)
    assert (nf, samples, sr) == (nf2, samples2, sr2)
    np.testing.assert_allclose(our_spec, their_spec, atol=1e-9)


def test_compat_file_roundtrip(tmp_path):
    sr = 48000
    audio = _tone(2 * sr, sr)
    wav_in = str(tmp_path / "in.wav")
    compat.save_wav(wav_in, audio, sr)
    p = compat.Phase(sample_rate=sr)
    png = str(tmp_path / "x.png")
    p.to_phase_wav(wav_in, png)
    wav_out = str(tmp_path / "out.wav")
    rate = compat.Phase(sample_rate=sr).to_wav_png(png, wav_out)
    assert rate == sr
    rec = compat.load_wav(wav_out)
    n = min(len(rec), len(audio))
    corr = np.corrcoef(audio[4096:n - 4096], rec[4096:n - 4096])[0, 1]
    assert corr > 0.99


def test_compat_unsupported_rate_raises():
    with pytest.raises(ValueError):
        compat.Phase(sample_rate=12345)


@needs_ref
def test_hdr_png_cross_compat_both_directions(tmp_path):
    """16-bit HDR PNGs interchange with the reference (via the pypng shim)."""
    sr = 48000
    ours = compat.Phase(sample_rate=sr, HDR=True)
    theirs = ref.Phase(sample_rate=sr, HDR=True)
    assert ours.num_freqs == theirs.num_freqs == 1536
    audio = compat.pad(_tone(30000), 1280)
    spec = ours.to_phase(audio)

    f_ours = str(tmp_path / "ours16.png")
    f_ref = str(tmp_path / "ref16.png")
    compat.save_image(f_ours, spec, 1536, 2.5, sr, True, True, 0)
    ref.save_image(f_ref, spec, 1536, 2.5, sr, True, True, 0)

    o_from_o = compat.load_image(f_ours, True, True, 0)
    r_from_o = ref.load_image(f_ours, True, True, 0)
    o_from_r = compat.load_image(f_ref, True, True, 0)
    r_from_r = ref.load_image(f_ref, True, True, 0)
    np.testing.assert_array_equal(o_from_o[0], r_from_o[0])
    np.testing.assert_array_equal(o_from_r[0], r_from_r[0])
    np.testing.assert_array_equal(o_from_o[0], o_from_r[0])
    assert o_from_o[1:] == pytest.approx(r_from_r[1:])


def test_install_registers_module_aliases():
    import importlib
    import subprocess
    import sys
    # clean interpreter so the oracle's `phase` import isn't in the way
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import gomel_tpu.compat as c\n"
        "c.install()\n"
        "from phase import Phase\n"
        "import png\n"
        "p = Phase(sample_rate=48000)\n"
        "assert p.num_freqs == 768\n"
        "print('alias ok')\n"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, cwd="/root/repo", timeout=300)
    assert out.returncode == 0, out.stderr
    assert "alias ok" in out.stdout
