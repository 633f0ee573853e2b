"""Filterbank weight-matrix tests.

The library builds ``domel``/``undomel`` (reference mel/impl.go:310-384) as
precomputed matrices; these tests validate the matrices against an independent
literal scalar-loop oracle transcribed from the reference's documented
semantics, applied to random spectra.
"""
import conftest  # noqa: F401

import math

import numpy as np
import pytest

from gomel_tpu.core.filterbank import (
    hz_to_mel, inverse_mel_weights, mel_to_hz, mel_weights)


def oracle_domel(filtersize, mels, spectrum, fmin, fmax):
    """Scalar transcription of domel (mel/impl.go:310-345); spectrum [T*filtersize, 2]."""
    melbin = hz_to_mel(fmax) / mels
    out = []
    for j in range(0, len(spectrum), filtersize):
        for i in range(mels):
            vallo = filtersize * (fmin + mel_to_hz(melbin * i)) / (fmax + fmin)
            valhi = filtersize * (fmin + mel_to_hz(melbin * (i + 1))) / (fmax + fmin)
            modlo, inlo = math.modf(vallo)
            inhi = math.floor(valhi)
            if inlo < 0:
                inlo, modlo, inhi = 0, 0, 0
            tot = [0.0, 0.0]
            for ch in range(2):
                total = 0.0
                if int(inlo) + 1 == int(inhi):
                    total += spectrum[j + int(inlo)][ch] * (1 - modlo)
                    total += spectrum[j + int(inhi)][ch] * modlo
                else:
                    for k in range(int(inlo), int(inhi)):
                        total += spectrum[j + k][ch]
                    total /= int(inhi) - int(inlo) + 1
                tot[ch] = total
            out.append(tot)
    return np.array(out)


def oracle_undomel(filtersize, mels, melspectrum, fmin, fmax):
    """Scalar transcription of undomel (mel/impl.go:347-384)."""
    filterbin = hz_to_mel(fmax) / mels
    out = []
    for j in range(0, len(melspectrum), mels):
        for i in range(filtersize):
            vallo = hz_to_mel(i * (fmax + fmin) / filtersize - fmin) / filterbin
            valhi = hz_to_mel((i + 1) * (fmax + fmin) / filtersize - fmin) / filterbin
            modlo, inlo = math.modf(vallo)
            inhi = math.floor(valhi)
            if inlo < 0:
                inlo, modlo, inhi = 0, 0, 0
            tot = [0.0, 0.0]
            for ch in range(2):
                total = 0.0
                if int(inlo) == int(inhi):
                    total += melspectrum[j + int(inlo)][ch]
                elif int(inlo) + 1 == int(inhi) and int(inhi) < mels:
                    total += melspectrum[j + int(inlo)][ch] * (1 - modlo)
                    total += melspectrum[j + int(inhi)][ch] * modlo
                else:
                    for k in range(int(inlo), int(inhi)):
                        total += melspectrum[j + k][ch]
                    total /= inhi - inlo + 1
                tot[ch] = total
            out.append(tot)
    return np.array(out)


CONFIGS = [
    (1024, 160, 0.0, 8000.0),    # NewMel defaults (mel/mel.go:30-41)
    (2048, 192, 0.0, 16000.0),   # CLI config (cmd/tomel/main.go:24-31)
    (2048, 80, 0.0, 8000.0),
    (512, 64, 0.0, 11025.0),
]


@pytest.mark.parametrize("n_bins,n_mels,fmin,fmax", CONFIGS)
def test_mel_weights_match_oracle(n_bins, n_mels, fmin, fmax):
    rng = np.random.RandomState(1)
    T = 3
    spectrum = rng.rand(T * n_bins, 2)
    expect = oracle_domel(n_bins, n_mels, spectrum, fmin, fmax)
    w = mel_weights(n_bins, n_mels, fmin, fmax)
    got = np.einsum("mb,tbc->tmc", w, spectrum.reshape(T, n_bins, 2)).reshape(-1, 2)
    np.testing.assert_allclose(got, expect, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("n_bins,n_mels,fmin,fmax", CONFIGS)
def test_inverse_mel_weights_match_oracle(n_bins, n_mels, fmin, fmax):
    rng = np.random.RandomState(2)
    T = 3
    mel = rng.rand(T * n_mels, 2)
    expect = oracle_undomel(n_bins, n_mels, mel, fmin, fmax)
    u = inverse_mel_weights(n_bins, n_mels, fmin, fmax)
    got = np.einsum("bm,tmc->tbc", u, mel.reshape(T, n_mels, 2)).reshape(-1, 2)
    np.testing.assert_allclose(got, expect, rtol=1e-12, atol=1e-12)


def test_mel_scale_constants():
    # HTK constants (mel/impl.go:298-308)
    assert hz_to_mel(0.0) == 0.0
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(1234.5)), 1234.5, rtol=1e-12)
    np.testing.assert_allclose(hz_to_mel(700.0), 1127.0 * math.log(2.0), rtol=1e-12)
