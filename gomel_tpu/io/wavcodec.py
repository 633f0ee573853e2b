"""Self-contained RIFF/WAVE codec.

Replaces the scipy.io.wavfile dependency (and the reference's faiface/beep,
/root/reference/mel/impl.go:195-264): reads PCM 8/16/24/32-bit integer and
32/64-bit float WAV including WAVE_FORMAT_EXTENSIBLE, any channel count;
writes mono/any-channel 16-bit PCM. 24-bit support matches what beep decodes
and scipy lacks.
"""
from __future__ import annotations

import struct

import numpy as np

_PCM = 1
_FLOAT = 3
_EXTENSIBLE = 0xFFFE


def read_wav(path: str) -> tuple[np.ndarray, int]:
    """Read a WAV file -> (samples [n] or [n, ch], sample_rate).

    Integer PCM keeps its native integer dtype (int16 for 16-bit, int32 for
    24/32-bit with 24-bit shifted to the high bytes — the scipy convention
    callers already normalize); float data returns float32/float64 as stored.
    """
    with open(path, "rb") as f:
        data = f.read()
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError(f"not a RIFF/WAVE file: {path!r}")
    pos = 12
    fmt = None
    payload = None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8: pos + 8 + size]
        if tag == b"fmt ":
            fmt = body
        elif tag == b"data":
            payload = body
        pos += 8 + size + (size & 1)   # chunks are word-aligned
        if fmt is not None and payload is not None:
            break
    if fmt is None or payload is None:
        raise ValueError(f"missing fmt/data chunk: {path!r}")
    if len(fmt) < 16:
        raise ValueError(f"truncated fmt chunk ({len(fmt)} bytes): {path!r}")
    (audio_format, channels, rate, _byte_rate, _block_align,
     bits) = struct.unpack_from("<HHIIHH", fmt, 0)
    if channels == 0:
        raise ValueError(f"corrupt WAV: zero channels: {path!r}")
    if audio_format == _EXTENSIBLE:
        if len(fmt) >= 26:
            audio_format = struct.unpack_from("<H", fmt, 24)[0]
        else:
            raise ValueError("malformed WAVE_FORMAT_EXTENSIBLE fmt chunk")

    if audio_format == _FLOAT:
        if bits not in (32, 64):
            raise ValueError(f"unsupported float WAV bit depth {bits}")
        dtype = np.float32 if bits == 32 else np.float64
        payload = payload[: len(payload) - len(payload) % (bits // 8)]
        arr = np.frombuffer(payload, dtype="<" + np.dtype(dtype).char)
    elif audio_format == _PCM:
        if bits == 8:
            arr = np.frombuffer(payload, dtype=np.uint8)
        elif bits == 16:
            arr = np.frombuffer(payload[: len(payload) & ~1], dtype="<i2")
        elif bits == 24:
            raw = np.frombuffer(payload, dtype=np.uint8)
            raw = raw[: (len(raw) // 3) * 3].reshape(-1, 3)
            # place the 24 bits in the high bytes of int32 (sign-correct)
            arr = ((raw[:, 0].astype(np.uint32) << 8)
                   | (raw[:, 1].astype(np.uint32) << 16)
                   | (raw[:, 2].astype(np.uint32) << 24)).astype(np.int32)
        elif bits == 32:
            arr = np.frombuffer(payload[: len(payload) & ~3], dtype="<i4")
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    else:
        raise ValueError(f"unsupported WAV format code {audio_format}")

    if channels > 1:
        arr = arr[: (len(arr) // channels) * channels]
        arr = arr.reshape(-1, channels)
    return arr, int(rate)


def write_wav(path: str, samples: np.ndarray, sample_rate: int) -> None:
    """Write 16-bit PCM WAV. samples: int16 [n] or [n, ch]."""
    samples = np.asarray(samples, dtype="<i2")
    channels = 1 if samples.ndim == 1 else samples.shape[1]
    payload = samples.tobytes()
    byte_rate = sample_rate * channels * 2
    header = (b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
              + b"fmt " + struct.pack("<IHHIIHH", 16, _PCM, channels,
                                      sample_rate, byte_rate, channels * 2, 16)
              + b"data" + struct.pack("<I", len(payload)))
    with open(path, "wb") as f:
        f.write(header + payload)
