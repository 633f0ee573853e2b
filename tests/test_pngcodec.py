"""PNG codec cross-validation against PIL (independent implementation)."""
import numpy as np
import pytest
from PIL import Image

from gomel_tpu.io.pngcodec import read_png, write_png
from gomel_tpu.io import _native


def _rand(shape, dtype, seed=0):
    rng = np.random.default_rng(seed)
    hi = 65536 if dtype == np.uint16 else 256
    return rng.integers(0, hi, size=shape).astype(dtype)


@pytest.mark.parametrize("shape,mode", [
    ((37, 53, 3), "RGB"),
    ((37, 53, 4), "RGBA"),
    ((37, 53), "L"),
])
def test_write_readable_by_pil_8bit(tmp_path, shape, mode):
    img = _rand(shape, np.uint8)
    p = str(tmp_path / "x.png")
    write_png(p, img)
    got = np.asarray(Image.open(p))
    np.testing.assert_array_equal(got, img)


def test_write_16bit_rgb_readable(tmp_path):
    # PIL can't read 16-bit RGB directly; verify with our own reader plus a
    # raw spot-check of big-endian sample order in the decompressed stream
    import struct
    import zlib
    img = _rand((9, 11, 3), np.uint16, seed=1)
    p = str(tmp_path / "x16.png")
    write_png(p, img)
    got = read_png(p)
    assert got.dtype == np.uint16
    np.testing.assert_array_equal(got, img)
    # independent byte-level check (a symmetric endianness bug would pass the
    # round trip): row 0 is written with filter type 0, so its first sample
    # must appear as big-endian bytes right after the filter byte
    data = open(p, "rb").read()
    pos, idat = 8, b""
    while pos + 8 <= len(data):
        size = struct.unpack_from(">I", data, pos)[0]
        tag = data[pos + 4: pos + 8]
        if tag == b"IDAT":
            idat += data[pos + 8: pos + 8 + size]
        pos += 12 + size
    raw = zlib.decompress(idat)
    assert raw[0] == 0  # row-0 filter type None
    assert raw[1:3] == struct.pack(">H", int(img[0, 0, 0]))


@pytest.mark.parametrize("mode", ["RGB", "RGBA", "L"])
def test_read_pil_written(tmp_path, mode):
    shape = (25, 31, {"RGB": 3, "RGBA": 4, "L": 1}[mode])
    img = _rand(shape, np.uint8, seed=2).squeeze()
    p = str(tmp_path / "pil.png")
    Image.fromarray(img, mode=mode).save(p)
    got = read_png(p)
    np.testing.assert_array_equal(got, img)


def test_python_fallback_matches_native(tmp_path, monkeypatch):
    img = _rand((19, 23, 4), np.uint8, seed=3)
    p1 = str(tmp_path / "nat.png")
    write_png(p1, img)
    native_bytes = open(p1, "rb").read()
    monkeypatch.setattr(_native._pngfilter, "_lib", None)
    monkeypatch.setattr(_native._pngfilter, "_tried", True)
    p2 = str(tmp_path / "py.png")
    write_png(p2, img)
    np.testing.assert_array_equal(read_png(p2), img)
    # and the python reader decodes the native-written file
    np.testing.assert_array_equal(read_png(p1), img)


def test_rejects_unsupported(tmp_path):
    with pytest.raises(ValueError):
        write_png(str(tmp_path / "bad.png"),
                  np.zeros((4, 4), dtype=np.float32))


class TestWavCodec:
    """In-tree WAV codec vs scipy (independent implementation) + 24-bit."""

    def test_roundtrip_matches_scipy(self, tmp_path):
        from scipy.io import wavfile
        from gomel_tpu.io.wavcodec import read_wav, write_wav
        rng = np.random.default_rng(0)
        pcm = rng.integers(-30000, 30000, 5000).astype(np.int16)
        p1, p2 = str(tmp_path / "ours.wav"), str(tmp_path / "scipy.wav")
        write_wav(p1, pcm, 48000)
        wavfile.write(p2, 48000, pcm)
        sr_s, got_s = wavfile.read(p1)            # scipy reads ours
        got_o, sr_o = read_wav(p2)                # we read scipy's
        assert sr_s == sr_o == 48000
        np.testing.assert_array_equal(got_s, pcm)
        np.testing.assert_array_equal(got_o, pcm)

    def test_stereo_and_float(self, tmp_path):
        from scipy.io import wavfile
        from gomel_tpu.io.wavcodec import read_wav
        rng = np.random.default_rng(1)
        st = rng.integers(-1000, 1000, (300, 2)).astype(np.int16)
        p = str(tmp_path / "st.wav")
        wavfile.write(p, 16000, st)
        got, sr = read_wav(p)
        np.testing.assert_array_equal(got, st)
        fl = rng.standard_normal(400).astype(np.float32)
        p2 = str(tmp_path / "fl.wav")
        wavfile.write(p2, 16000, fl)
        got2, _ = read_wav(p2)
        np.testing.assert_array_equal(got2, fl)

    def test_24bit_pcm(self, tmp_path):
        import struct
        from gomel_tpu.io.wavcodec import read_wav
        vals = np.array([0, 1, -1, 8388607, -8388608, 123456], dtype=np.int64)
        payload = b"".join(struct.pack("<i", int(v) << 8)[1:] for v in vals)
        header = (b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
                  + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 48000,
                                          48000 * 3, 3, 24)
                  + b"data" + struct.pack("<I", len(payload)))
        p = str(tmp_path / "b24.wav")
        with open(p, "wb") as f:
            f.write(header + payload)
        got, sr = read_wav(p)
        assert got.dtype == np.int32
        np.testing.assert_array_equal(got >> 8, vals)
        # full-scale normalization through the audio loader
        from gomel_tpu.io.audio import load_wav
        buf, _ = load_wav(p)
        assert abs(buf[3] - (8388607 << 8) / 2**31) < 1e-9


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
def test_compress_level_lossless(tmp_path, dtype):
    """Deflate level is an encoder-private speed/size knob — every level
    must decode to identical pixels (and stay PIL-readable for 8-bit)."""
    img = _rand((41, 29, 4), dtype, seed=3)
    got = {}
    for lvl in (0, 1, 3, 6, 9):
        p = str(tmp_path / f"l{lvl}.png")
        write_png(p, img, compress_level=lvl)
        got[lvl] = read_png(p)
        np.testing.assert_array_equal(got[lvl], img)
    if dtype == np.uint8:
        np.testing.assert_array_equal(
            np.asarray(Image.open(str(tmp_path / "l1.png"))), img)
