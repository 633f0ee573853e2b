"""HDR (16-bit PNG) and IHS (asinh compression) paths, end to end.

Reference behavior: HDR doubles num_freqs and writes NRGBA64/16-bit RGB
(/root/reference/phase/impl.go:191-196, phase.py:52-55,716-737); IHS applies
2 asinh passes before quantization on 8-bit output only
(/root/reference/phase/phase.go:31-36, phase/impl.go:170-177).
"""
import numpy as np
import pytest

from gomel_tpu import Phase, PhaseConfig
from gomel_tpu.io import imagecodec
from gomel_tpu.io.audio import load_wav, save_wav
from gomel_tpu.io.pngcodec import read_png


def _tone(n, sr=48000):
    t = np.arange(n) / sr
    return 0.5 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 1800 * t)


def test_ihs_passes_rule():
    assert PhaseConfig(ihs=True).ihs_passes == 2
    assert PhaseConfig(ihs=True, hdr=True, num_freqs=1536).ihs_passes == 0
    assert PhaseConfig().ihs_passes == 0


def test_ihs_quantization_improves_dynamic_range(tmp_path):
    # asinh compression reduces quantization error on small values when the
    # spectrogram has large dynamic range
    rng = np.random.default_rng(0)
    spec = rng.standard_normal((9, 96, 2))
    spec[0, 0, 0] = 500.0  # one dominating value
    plain = str(tmp_path / "plain.png")
    comp = str(tmp_path / "ihs.png")
    imagecodec.save_phase_image(plain, spec, True, 1.0, 48000.0, 0, False, "go")
    imagecodec.save_phase_image(comp, spec, True, 1.0, 48000.0, 2, False, "go")
    got_plain, *_ = imagecodec.load_phase_image(plain, True, 0, False, "go")
    got_comp, *_ = imagecodec.load_phase_image(comp, True, 2, False, "go")
    small = np.abs(spec) < 3.0
    err_plain = np.abs(got_plain - spec)[small].mean()
    err_comp = np.abs(got_comp - spec)[small].mean()
    assert err_comp < err_plain


@pytest.mark.parametrize("layout", ["go", "py"])
def test_hdr_image_is_16bit_and_more_precise(tmp_path, layout):
    rng = np.random.default_rng(1)
    spec = rng.standard_normal((7, 96, 2)) * 4.0
    f8 = str(tmp_path / "sdr.png")
    f16 = str(tmp_path / "hdr.png")
    imagecodec.save_phase_image(f8, spec, True, 1.0, 48000.0, 0, False, layout)
    imagecodec.save_phase_image(f16, spec, True, 1.0, 48000.0, 0, True, layout)
    img16 = read_png(f16)
    assert img16.dtype == np.uint16
    got8, *_ = imagecodec.load_phase_image(f8, True, 0, False, layout)
    got16, *_ = imagecodec.load_phase_image(f16, True, 0, True, layout)
    # improvement saturates at the float16 min/max metadata precision
    # (reference stores rescale endpoints as float16 regardless of bit depth)
    assert np.abs(got16 - spec).max() < np.abs(got8 - spec).max() / 20


def test_hdr_phase_file_roundtrip(tmp_path):
    sr = 48000
    audio = _tone(sr)
    wav_in = str(tmp_path / "in.wav")
    save_wav(wav_in, audio, sr)
    # HDR doubles num_freqs (reference phase.py:52-55)
    p = Phase(sample_rate=sr, hdr=True)
    assert p.config.num_freqs == 1536
    png = str(tmp_path / "hdr.png")
    p.to_phase_wav(wav_in, png)
    wav_out = str(tmp_path / "out.wav")
    Phase(sample_rate=sr, hdr=True).to_wav_png(png, wav_out)
    rec, out_sr = load_wav(wav_out)
    assert out_sr == sr
    n = min(len(rec), len(audio))
    corr = np.corrcoef(audio[4096:n - 4096], rec[4096:n - 4096])[0, 1]
    assert corr > 0.999


def test_ihs_phase_file_roundtrip(tmp_path):
    sr = 48000
    audio = _tone(sr)
    wav_in = str(tmp_path / "in.wav")
    save_wav(wav_in, audio, sr)
    p = Phase(sample_rate=sr, ihs=True)
    assert p.config.ihs_passes == 2
    png = str(tmp_path / "ihs.png")
    p.to_phase_wav(wav_in, png)
    wav_out = str(tmp_path / "out.wav")
    Phase(sample_rate=sr, ihs=True).to_wav_png(png, wav_out)
    rec, _ = load_wav(wav_out)
    n = min(len(rec), len(audio))
    corr = np.corrcoef(audio[4096:n - 4096], rec[4096:n - 4096])[0, 1]
    assert corr > 0.99
