"""Property-based tests: the 10 correctness properties from the reference's
Kiro design document (/root/reference/.kiro/specs/phase-python-port/design.md:
163-245), which the reference specified but never implemented (SURVEY.md §4).

Small codec configs keep Hypothesis iterations fast; the properties are
config-independent.
"""
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st, HealthCheck

from gomel_tpu import Mel, MelConfig, Phase, PhaseConfig
from gomel_tpu.core.framing import pad_length, is_padded
from gomel_tpu.io import imagecodec
from gomel_tpu.io.audio import save_wav, load_wav
from gomel_tpu.io.float16meta import pack_floats, unpack_floats

WINDOW, RESOLUT, NUM_FREQS = 64, 256, 96

_settings = settings(max_examples=25, deadline=None,
                     suppress_health_check=[HealthCheck.too_slow])

def _phase():
    return Phase(PhaseConfig(num_freqs=NUM_FREQS, window=WINDOW,
                             resolut=RESOLUT))


# Property 1: audio -> spectrogram -> audio round trip preserves signal
@_settings
@given(seed=st.integers(0, 2 ** 32 - 1),
       n=st.integers(WINDOW * 15, WINDOW * 60))
def test_p1_roundtrip_preserves_signal(seed, n):
    rng = np.random.default_rng(seed)
    # band-limited tonal signal: content above num_freqs bins AND below
    # ~1 bin (DC is dropped — the reference stores spectrum[j+1], never
    # bin 0) is discarded by design, so keep components in [2, 0.3*NF] bins
    t = np.arange(pad_length(n, WINDOW))
    freqs = rng.uniform(2.0 / (RESOLUT / 2), 0.3 * NUM_FREQS / (RESOLUT / 2), 4)
    audio = sum(a * np.sin(np.pi * f * t + ph) for a, f, ph in
                zip(rng.uniform(0.1, 0.3, 4), freqs, rng.uniform(0, 7, 4)))
    p = _phase()
    rec = p.from_phase(p.to_phase(audio))
    m = min(len(rec), len(audio))
    core = slice(RESOLUT, m - RESOLUT)
    corr = np.corrcoef(audio[core], rec[core])[0, 1]
    assert corr > 0.98


# Property 2: PNG round trip preserves spectrogram (within quantization)
@_settings
@given(seed=st.integers(0, 2 ** 32 - 1), hdr=st.booleans(),
       layout=st.sampled_from(["go", "py"]))
def test_p2_png_roundtrip(seed, hdr, layout, tmp_path_factory):
    rng = np.random.default_rng(seed)
    spec = rng.standard_normal((7, NUM_FREQS, 2)) * 3.0
    f = str(tmp_path_factory.mktemp("p2") / "s.png")
    imagecodec.save_phase_image(f, spec, True, 5.0, 48000.0, 0, hdr,
                                layout=layout)
    got, samples, sr, nf = imagecodec.load_phase_image(f, True, 0, hdr,
                                                       layout="auto")
    assert nf == NUM_FREQS
    maxs, mins = spec.max(axis=(0, 1)), spec.min(axis=(0, 1))
    # 1 LSB truncation error + float16 error on the stored min/max endpoints
    tol = ((maxs - mins).max() / (65535 if hdr else 255)
           + 2e-3 * max(np.abs(maxs).max(), np.abs(mins).max()) + 1e-3)
    np.testing.assert_allclose(got, spec, atol=tol)


# Property 3: configuration parameters are respected
@_settings
@given(window=st.sampled_from([32, 64, 128]),
       resolut=st.sampled_from([128, 256]),
       nf_frac=st.floats(0.25, 1.0))
def test_p3_config_respected(window, resolut, nf_frac):
    nf = max(1, int(resolut // 2 * nf_frac))
    p = Phase(PhaseConfig(num_freqs=nf, window=window, resolut=resolut))
    audio = np.sin(np.arange(pad_length(window * 20, window)) * 0.05)
    spec = p.to_phase(audio)
    frames = (len(audio) - resolut) // window + 1
    assert spec.shape == (frames * nf, 2)


# Property 4: spectrogram output has correct dimensions
@_settings
@given(n=st.integers(0, WINDOW * 40))
def test_p4_output_dimensions(n):
    audio = np.zeros(n)
    p = _phase()
    spec = p.to_phase(audio)
    padded = pad_length(n, WINDOW)
    frames = (padded - RESOLUT) // WINDOW + 1
    assert spec.shape == (frames * NUM_FREQS, 2)


# Property 5: volume boost scales output
@_settings
@given(seed=st.integers(0, 2 ** 32 - 1), boost=st.floats(0.5, 4.0))
def test_p5_volume_boost_scales(seed, boost):
    rng = np.random.default_rng(seed)
    audio = rng.uniform(-0.5, 0.5, WINDOW * 20)
    base = _phase()
    boosted = Phase(PhaseConfig(num_freqs=NUM_FREQS, window=WINDOW,
                                resolut=RESOLUT, volume_boost=boost))
    spec = base.to_phase(audio)
    a = base.from_phase(spec)
    b = boosted.from_phase(spec)
    np.testing.assert_allclose(b, a * boost, atol=1e-4 * max(1.0, boost))


# Property 6: WAV save/load round trip preserves audio
@_settings
@given(seed=st.integers(0, 2 ** 32 - 1), n=st.integers(1, 5000))
def test_p6_wav_roundtrip(seed, n, tmp_path_factory):
    rng = np.random.default_rng(seed)
    audio = rng.uniform(-1.0, 1.0, n)
    f = str(tmp_path_factory.mktemp("p6") / "a.wav")
    save_wav(f, audio, 48000)
    got, sr = load_wav(f)
    assert sr == 48000
    np.testing.assert_allclose(got, audio, atol=1.0 / 32768)


# Property 7: clipping prevents out-of-range values
@_settings
@given(seed=st.integers(0, 2 ** 32 - 1))
def test_p7_clipping(seed, tmp_path_factory):
    rng = np.random.default_rng(seed)
    audio = rng.uniform(-5.0, 5.0, 1000)
    f = str(tmp_path_factory.mktemp("p7") / "a.wav")
    save_wav(f, audio, 16000)
    got, _ = load_wav(f)
    assert np.all(got <= 1.0) and np.all(got >= -1.0)
    np.testing.assert_allclose(got, np.clip(audio, -1, 1), atol=1.0 / 32768)


# Property 8: y-axis reversal consistency
@_settings
@given(seed=st.integers(0, 2 ** 32 - 1), y=st.booleans())
def test_p8_y_reverse(seed, y, tmp_path_factory):
    rng = np.random.default_rng(seed)
    spec = rng.standard_normal((5, NUM_FREQS, 2))
    f = str(tmp_path_factory.mktemp("p8") / "s.png")
    imagecodec.save_phase_image(f, spec, y, 1.0, 48000.0, 0, False, "go")
    same, *_ = imagecodec.load_phase_image(f, y, 0, False, "go")
    maxs, mins = spec.max(axis=(0, 1)), spec.min(axis=(0, 1))
    tol = ((maxs - mins).max() / 255
           + 2e-3 * max(np.abs(maxs).max(), np.abs(mins).max()) + 1e-3)
    np.testing.assert_allclose(same, spec, atol=tol)


# Property 9: metadata embedding preserves reconstruction parameters
@_settings
@given(vals=st.lists(st.floats(-1000, 60000), min_size=6, max_size=6))
def test_p9_metadata_roundtrip(vals):
    data = pack_floats(vals)
    got = unpack_floats(data, 6)
    for v, g in zip(vals, got):
        assert g == pytest.approx(np.float64(np.float16(v)), rel=1e-3,
                                  abs=1e-4)


# Property 10: padding applied and removed correctly
@_settings
@given(n=st.integers(1, WINDOW * 40))
def test_p10_padding(n):
    padded = pad_length(n, WINDOW)
    assert padded >= n
    assert padded >= 15 * WINDOW - 1
    assert is_padded(n, padded, WINDOW)
    if padded != n:
        assert not is_padded(n, n, WINDOW)
    if n >= 15 * WINDOW:
        rem = (n - 15 * WINDOW) % WINDOW
        assert padded == n + (WINDOW - rem - 1 if rem else 0)
