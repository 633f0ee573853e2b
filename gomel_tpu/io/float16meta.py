"""float16 metadata byte packing for PNG-embedded reconstruction parameters.

Reference: Go packs via x448/float16 little-endian
(/root/reference/mel/impl.go:120-125, phase/impl.go:155-160); the Python port
uses ``struct.pack('<e', np.float16(v))`` (/root/reference/phase.py:608-640).
Both are IEEE binary16 little-endian; numpy reproduces the same bits
(round-to-nearest-even from float32).
"""
from __future__ import annotations

import struct

import numpy as np


def pack_float16(value: float) -> bytes:
    """float -> 2 little-endian bytes of IEEE binary16."""
    return struct.pack("<e", np.float16(np.float32(value)))


def unpack_float16(data: bytes) -> float:
    """2 little-endian bytes of IEEE binary16 -> float64."""
    return float(np.float64(struct.unpack("<e", bytes(data[:2]))[0]))


def pack_floats(values) -> bytes:
    return b"".join(pack_float16(v) for v in values)


def unpack_floats(data: bytes, count: int) -> list[float]:
    return [unpack_float16(data[2 * i: 2 * i + 2]) for i in range(count)]
