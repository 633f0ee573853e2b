"""CLI tool tests: routing rules, default parameters, end-to-end files."""
import os

import numpy as np
import pytest

from gomel_tpu.cli import tools
from gomel_tpu.io.audio import load_wav, save_wav
from gomel_tpu.io import flac as flacmod


@pytest.fixture(scope="module")
def wav_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    sr = 48000
    t = np.arange(sr) / sr
    audio = 0.5 * np.sin(2 * np.pi * 440 * t)
    p = str(d / "tone.wav")
    save_wav(p, audio, sr)
    return p


def test_route_audio_input():
    # reference routing (cmd/tomel/main.go:33-59)
    assert tools._route_audio_input("a.flac") == ("a.flac", "flac")
    assert tools._route_audio_input("a.wav") == ("a.wav", "wav")
    assert tools._route_audio_input("a") == ("a.wav", "wav")


def test_tomel_towav_roundtrip(wav_file, tmp_path):
    png = str(tmp_path / "m.png")
    wav = str(tmp_path / "m.wav")
    assert tools.tomel([wav_file, "-o", png]) == 0
    assert os.path.exists(png)
    assert tools.towav([png, "48000", "-o", wav]) == 0
    rec, sr = load_wav(wav)
    assert sr == 48000
    assert len(rec) > 0


def test_tophase_fromphase_roundtrip(wav_file, tmp_path):
    png = str(tmp_path / "p.png")
    wav = str(tmp_path / "p.wav")
    assert tools.tophase([wav_file, "-o", png]) == 0
    assert tools.fromphase([png, "-o", wav]) == 0
    rec, sr = load_wav(wav)
    orig, _ = load_wav(wav_file)
    n = min(len(rec), len(orig))
    corr = np.corrcoef(orig[4096:n - 4096], rec[4096:n - 4096])[0, 1]
    assert corr > 0.99


def test_tophase_flac_input(tmp_path):
    sr = 48000
    t = np.arange(sr // 2) / sr
    audio = 0.4 * np.sin(2 * np.pi * 330 * t)
    f = str(tmp_path / "x.flac")
    flacmod.write_flac(f, audio, sr)
    png = str(tmp_path / "x.png")
    assert tools.tophase([f, "-o", png]) == 0
    assert os.path.exists(png)


def test_bare_name_implies_wav(wav_file, tmp_path):
    base = wav_file[: -len(".wav")]
    assert tools.tomel([base, "-o", str(tmp_path / "b.png")]) == 0


def test_missing_file_errors(tmp_path, capsys):
    rc = tools.tomel([str(tmp_path / "nope.wav")])
    assert rc == 1
    assert "Error generating mel spectrogram" in capsys.readouterr().err


def test_main_dispatch(wav_file, tmp_path):
    assert tools.main(["tomel", wav_file,
                       "-o", str(tmp_path / "d.png")]) == 0
    assert tools.main(["bogus"]) == 1
    assert tools.main([]) == 1
