"""File-level sample-rate matrix: zero-stuff upsampling end to end.

The real-test equivalent of the reference's manual scripts
(/root/reference/test_upsampling.py, test_zero_stuff.py — print-based, with
external fixtures): every supported input rate goes WAV -> phase PNG ->
WAV; the output lands at the family main rate and preserves the tone.
"""
import numpy as np
import pytest

from gomel_tpu import Phase
from gomel_tpu.core.config import pad_shift
from gomel_tpu.io.audio import load_wav, save_wav


def _tone_level_vs_max(x: np.ndarray, sr: int, tone: float) -> float:
    """|spectrum| at ``tone`` relative to the overall max (dB)."""
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    spec[:5] = 0  # ignore DC leakage
    k = int(round(tone * len(x) / sr))
    level = spec[max(k - 2, 0): k + 3].max()
    return 20 * np.log10(level / spec.max())


@pytest.mark.parametrize("sr,main_rate", [
    (8000, 48000), (16000, 48000), (24000, 48000), (32000, 48000),
    (48000, 48000), (11025, 44100), (22050, 44100), (44100, 44100),
])
def test_rate_family_roundtrip(sr, main_rate, tmp_path):
    tone = 440.0
    n = sr  # 1 second
    t = np.arange(n) / sr
    audio = 0.5 * np.sin(2 * np.pi * tone * t)
    wav_in = str(tmp_path / "in.wav")
    save_wav(wav_in, audio, sr)

    p = Phase(sample_rate=sr)
    png = str(tmp_path / "p.png")
    p.to_phase_wav(wav_in, png)
    wav_out = str(tmp_path / "out.wav")
    out_rate = Phase(num_freqs=p.config.num_freqs,
                     y_reverse=True).to_wav_png(png, wav_out)
    assert out_rate == main_rate
    rec, got_sr = load_wav(wav_out)
    assert got_sr == main_rate

    # duration preserved: upsample factor x trim-back
    zp, zs = pad_shift(sr)
    factor = (zp + zs) / zp if zp else 1.0
    expected = n * factor
    assert len(rec) == pytest.approx(expected, rel=0.02)

    # the tone survives at its absolute frequency. NB zero-stuffing creates
    # EQUAL-magnitude spectral images at k*sr +/- tone (the reference applies
    # no interpolation filter), so assert the baseband component is within
    # 3 dB of the strongest peak rather than strictly dominant.
    core = rec[len(rec) // 4: -len(rec) // 4]
    assert _tone_level_vs_max(core, main_rate, tone) > -3.0
