"""FLAC codec: native decoder (ctypes over gomel_tpu/native/flacdec.cpp) + pure-Python
fallback decoder + a spec-compliant encoder.

Replaces the reference's mewkiz/flac dependency
(/root/reference/mel/impl.go:266-296, phase/impl.go:351-381). The scaling
quirks (mel 1/65536 vs phase 1/32768) live in io/audio.py; this module returns
raw integer PCM.

The encoder writes VERBATIM subframes (one frame per fixed-size block) — it
exists so the framework is self-contained for tests and round-trips; the
decoder handles the full spec (FIXED/LPC/Rice/stereo decorrelation) for
real-world files.
"""
from __future__ import annotations

import ctypes
import struct

import numpy as np

from ._native import NativeLib


def _configure_flac(lib):
    lib.flac_decode.restype = ctypes.c_int
    lib.flac_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.c_long]
    lib.flac_free.restype = None
    lib.flac_free.argtypes = [ctypes.POINTER(ctypes.c_int32)]


_flaclib = NativeLib("flacdec.cpp", "_flacdec.so", _configure_flac)


def _get_lib():
    return _flaclib.get()


DEFAULT_MAX_SAMPLES = 1 << 31  # total across channels; ~6 h 48 kHz stereo


def read_flac(path: str, layout: str = "interleaved",
              max_samples: int | None = None) -> tuple[np.ndarray, int]:
    """Decode a FLAC file -> (int PCM, sample_rate).

    layout="interleaved": [n, channels] (or [n] mono) sample-interleaved.
    layout="go_concat": the Go reference's iteration order — per FLAC frame,
    each channel's samples appended in sequence as ONE mono stream (the
    loaders loop subframes with the per-channel break commented out,
    /root/reference/phase/impl.go:373-378); mono files are identical in both
    layouts.

    ``max_samples`` raises/lowers the decompression-bomb ceiling (total
    samples across channels; default DEFAULT_MAX_SAMPLES = 2^31) — pass a
    larger value for legitimate multi-hour archives.

    16-bit streams return int16 arrays (so io.audio._to_float applies the
    1/32768 scaling the reference uses for 16-bit content); deeper streams
    return int32 scaled to full 32-bit range.
    """
    if layout not in ("interleaved", "go_concat"):
        raise ValueError(f"unknown layout {layout!r}")
    lay = 1 if layout == "go_concat" else 0
    cap = int(max_samples) if max_samples else DEFAULT_MAX_SAMPLES
    with open(path, "rb") as f:
        data = f.read()
    lib = _get_lib()
    if lib is not None:
        out = ctypes.POINTER(ctypes.c_int32)()
        n = ctypes.c_long()
        ch = ctypes.c_int()
        sr = ctypes.c_int()
        bps = ctypes.c_int()
        rc = lib.flac_decode(data, len(data), lay, ctypes.byref(out),
                             ctypes.byref(n), ctypes.byref(ch),
                             ctypes.byref(sr), ctypes.byref(bps), cap)
        if rc != 0:
            raise ValueError(f"FLAC decode failed (rc={rc}): {path!r}")
        try:
            arr = np.ctypeslib.as_array(out, shape=(n.value * ch.value,)).copy()
        finally:
            lib.flac_free(out)
        pcm, channels, rate, depth = arr, ch.value, sr.value, bps.value
    else:
        pcm, channels, rate, depth = _decode_python(data, lay, cap)
    pcm = pcm.reshape(-1, channels)
    if channels == 1:
        pcm = pcm[:, 0]
    if depth <= 16:
        return pcm.astype(np.int16), rate
    return (pcm.astype(np.int64) << (32 - depth)).astype(np.int32), rate


# ---------------------------------------------------------------------------
# Pure-Python fallback decoder (same spec coverage as the native one)
# ---------------------------------------------------------------------------

class _Bits:
    def __init__(self, data: bytes, pos: int = 0):
        self.d = data
        self.pos = pos * 8

    def bits(self, n: int) -> int:
        v = 0
        d, p = self.d, self.pos
        for _ in range(n):
            byte = d[p >> 3]
            v = (v << 1) | ((byte >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = p
        return v

    def sbits(self, n: int) -> int:
        v = self.bits(n)
        return v - (1 << n) if n and v & (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.bits(1) == 0:
            q += 1
        return q

    def align(self):
        self.pos = (self.pos + 7) & ~7

    @property
    def byte_pos(self):
        return self.pos >> 3


def _decode_residual_py(br: _Bits, blocksize: int, order: int, out: list):
    method = br.bits(2)
    pb = 4 if method == 0 else 5
    escape = 0xF if method == 0 else 0x1F
    po = br.bits(4)
    idx = order
    for p in range(1 << po):
        count = (blocksize >> po) - (order if p == 0 else 0)
        param = br.bits(pb)
        if param == escape:
            raw = br.bits(5)
            for _ in range(count):
                out[idx] = br.sbits(raw)
                idx += 1
        else:
            for _ in range(count):
                q = br.unary()
                v = (q << param) | br.bits(param)
                out[idx] = (v >> 1) ^ -(v & 1)
                idx += 1


_FIXED_COEF = {1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _decode_subframe_py(br: _Bits, blocksize: int, bps: int) -> list:
    if br.bits(1):
        raise ValueError("bad subframe pad bit")
    tp = br.bits(6)
    wasted = (br.unary() + 1) if br.bits(1) else 0
    bps -= wasted
    out = [0] * blocksize
    if tp == 0:
        out = [br.sbits(bps)] * blocksize
    elif tp == 1:
        out = [br.sbits(bps) for _ in range(blocksize)]
    elif (tp & 0x38) == 0x08 and (tp & 7) <= 4:
        order = tp & 7
        if order > blocksize:
            raise ValueError("predictor order exceeds blocksize")
        for i in range(order):
            out[i] = br.sbits(bps)
        _decode_residual_py(br, blocksize, order, out)
        coef = _FIXED_COEF.get(order, [])
        for i in range(order, blocksize):
            out[i] += sum(c * out[i - 1 - j] for j, c in enumerate(coef))
    elif tp & 0x20:
        order = (tp & 0x1F) + 1
        if order > blocksize:
            raise ValueError("predictor order exceeds blocksize")
        for i in range(order):
            out[i] = br.sbits(bps)
        precision = br.bits(4) + 1
        shift = br.sbits(5)
        coef = [br.sbits(precision) for _ in range(order)]
        _decode_residual_py(br, blocksize, order, out)
        for i in range(order, blocksize):
            acc = sum(coef[j] * out[i - 1 - j] for j in range(order))
            out[i] += acc >> shift
    else:
        raise ValueError(f"reserved subframe type {tp}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def _decode_python(data: bytes, layout: int = 0,
                   max_samples: int = DEFAULT_MAX_SAMPLES
                   ) -> tuple[np.ndarray, int, int, int]:
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    si_bps = si_sr = si_ch = 0
    total = 0
    last = False
    while not last:
        hdr = data[pos]
        last = bool(hdr & 0x80)
        tp = hdr & 0x7F
        blen = int.from_bytes(data[pos + 1:pos + 4], "big")
        pos += 4
        if tp == 0:
            p = data[pos:pos + 34]
            si_sr = (p[10] << 12) | (p[11] << 4) | (p[12] >> 4)
            si_ch = ((p[12] >> 1) & 7) + 1
            si_bps = (((p[12] & 1) << 4) | (p[13] >> 4)) + 1
            total = ((p[13] & 0xF) << 32) | int.from_bytes(p[14:18], "big")
        pos += blen

    pcm: list = []
    nch_out = 0
    # decompression-bomb bound, mirroring the native decoder
    # (gomel_tpu/native/flacdec.cpp): declared length + one max block of
    # slack when STREAMINFO gives one, else a generous silence-stream
    # expansion bound tied to input size; hard-capped
    if total:
        bomb_cap = (total + 65536) * (si_ch or 8)
    else:
        bomb_cap = len(data) * 8192 + (1 << 20)
    bomb_cap = min(bomb_cap, max_samples)
    while pos + 4 < len(data):
        while pos + 1 < len(data) and not (
            data[pos] == 0xFF and (data[pos + 1] & 0xFC) == 0xF8
        ):
            pos += 1
        if pos + 4 >= len(data):
            break
        sync_pos = pos
        br = _Bits(data, pos)
        try:
            br.bits(16)  # sync+reserved+strategy
            bs_code = br.bits(4)
            sr_code = br.bits(4)
            ch_code = br.bits(4)
            ss_code = br.bits(3)
            br.bits(1)
            b0 = br.bits(8)
            follow = (6 if b0 >= 0xFE else 5 if b0 >= 0xFC else 4 if b0 >= 0xF8
                      else 3 if b0 >= 0xF0 else 2 if b0 >= 0xE0
                      else 1 if b0 >= 0xC0 else 0)
            for _ in range(follow):
                br.bits(8)
            if bs_code == 1:
                bs = 192
            elif bs_code == 6:
                bs = br.bits(8) + 1
            elif bs_code == 7:
                bs = br.bits(16) + 1
            elif 2 <= bs_code <= 5:
                bs = 576 << (bs_code - 2)
            else:
                bs = 256 << (bs_code - 8)
            if sr_code == 12:
                br.bits(8)
            elif sr_code in (13, 14):
                br.bits(16)
            bps = {0: si_bps, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}[ss_code]
            br.bits(8)  # crc8
            nch = ch_code + 1 if ch_code < 8 else 2
            chans = []
            for c in range(nch):
                extra = int((ch_code == 8 and c == 1) or
                            (ch_code == 9 and c == 0) or
                            (ch_code == 10 and c == 1))
                chans.append(_decode_subframe_py(br, bs, bps + extra))
            br.align()
            br.bits(16)  # crc16
        except (IndexError, ValueError, KeyError):
            pos = sync_pos + 1  # corrupt frame: resync past this sync word
            continue
        if ch_code == 8:
            chans[1] = [l - s for l, s in zip(chans[0], chans[1])]
        elif ch_code == 9:
            chans[0] = [r + s for s, r in zip(chans[0], chans[1])]
        elif ch_code == 10:
            m2 = [((m << 1) | (s & 1)) for m, s in zip(chans[0], chans[1])]
            chans[0] = [(m + s) >> 1 for m, s in zip(m2, chans[1])]
            chans[1] = [(m - s) >> 1 for m, s in zip(m2, chans[1])]
        nch_out = nch_out or nch
        if len(pcm) + nch * bs > bomb_cap:
            raise ValueError("FLAC decode failed (rc=-7): decompression "
                             "bomb (decoded size exceeds plausibility bound)")
        if layout == 1:
            for c in range(nch):
                pcm.extend(chans[c])
        else:
            for i in range(bs):
                for c in range(nch):
                    pcm.append(chans[c][i])
        pos = br.byte_pos
    if not pcm:
        raise ValueError("no FLAC frames decoded")
    arr = np.asarray(pcm, dtype=np.int64)
    if layout == 1:
        return arr.astype(np.int32), 1, si_sr, si_bps
    n = len(arr) // nch_out
    if total and total < n:
        arr = arr[: total * nch_out]
    return arr.astype(np.int32), nch_out, si_sr, si_bps


# ---------------------------------------------------------------------------
# Encoder (verbatim subframes)
# ---------------------------------------------------------------------------

def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    bits_left = n.bit_length()
    nbytes = 2
    while bits_left > 6 * (nbytes - 1) + (7 - nbytes) and nbytes < 7:
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int):
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


_BLOCKSIZE_CODES = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
                    256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
                    8192: 13, 16384: 14, 32768: 15}
_RATE_CODES = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5, 22050: 6,
               24000: 7, 32000: 8, 44100: 9, 48000: 10, 96000: 11}


def _write_subframe_verbatim(bw: "_BitWriter", samples, bps: int) -> None:
    bw.write(0, 1)
    bw.write(1, 6)  # VERBATIM
    bw.write(0, 1)  # no wasted bits
    for v in samples:
        bw.write(int(v), bps)


def _write_subframe_fixed2(bw: "_BitWriter", samples, bps: int) -> None:
    """FIXED order-2 subframe, one Rice partition (partition order 0)."""
    bw.write(0, 1)
    bw.write(0b001010, 6)  # FIXED, order 2
    bw.write(0, 1)         # no wasted bits
    s = [int(v) for v in samples]
    bw.write(s[0], bps)
    bw.write(s[1], bps)
    res = [s[i] - 2 * s[i - 1] + s[i - 2] for i in range(2, len(s))]
    zig = [((v << 1) if v >= 0 else (((-v) << 1) - 1)) for v in res]
    mean = (sum(zig) / max(len(zig), 1)) if zig else 0.0
    param = 0
    while (1 << (param + 1)) < mean + 1 and param < 14:
        param += 1
    bw.write(0, 2)      # residual method 0 (4-bit Rice)
    bw.write(0, 4)      # partition order 0
    bw.write(param, 4)
    for v in zig:
        q = v >> param
        for _ in range(q):
            bw.write(0, 1)
        bw.write(1, 1)
        bw.write(v & ((1 << param) - 1), param)


def write_flac(path: str, audio: np.ndarray, sample_rate: int,
               bps: int = 16, block_size: int = 4096,
               mode: str = "verbatim") -> None:
    """Encode int PCM (or float in [-1,1]) as a FLAC file.

    audio: [n] mono or [n, channels]. mode: "verbatim" or "fixed"
    (FIXED order-2 prediction + Rice residuals, far smaller for tonal audio).
    """
    audio = np.asarray(audio)
    if audio.dtype.kind == "f":
        audio = np.clip(np.rint(audio * (1 << (bps - 1))),
                        -(1 << (bps - 1)), (1 << (bps - 1)) - 1)
    audio = audio.astype(np.int64)
    if audio.ndim == 1:
        audio = audio[:, None]
    n, nch = audio.shape
    if not (1 <= nch <= 8):
        raise ValueError("1..8 channels")

    header = bytearray(b"fLaC")
    si = bytearray()
    si += struct.pack(">HH", block_size, block_size)
    si += b"\x00\x00\x00" * 2  # min/max frame size unknown
    packed = (sample_rate << 44) | ((nch - 1) << 41) | ((bps - 1) << 36) | n
    si += packed.to_bytes(8, "big")
    si += b"\x00" * 16  # md5 unset
    header += bytes([0x80]) + len(si).to_bytes(3, "big") + si

    body = bytearray()
    for frame_idx, start in enumerate(range(0, n, block_size)):
        block = audio[start:start + block_size]
        bs = block.shape[0]
        hw = _BitWriter()
        hw.write(0b11111111111110, 14)
        hw.write(0, 1)   # reserved
        hw.write(0, 1)   # fixed blocksize strategy
        bs_code = _BLOCKSIZE_CODES.get(bs, 7)
        hw.write(bs_code, 4)
        sr_code = _RATE_CODES.get(sample_rate, 14)
        hw.write(sr_code, 4)
        hw.write(nch - 1, 4)          # independent channels
        ss_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps]
        hw.write(ss_code, 3)
        hw.write(0, 1)
        hw.align()
        hdr = bytearray(hw.bytes())
        hdr += _utf8_number(frame_idx)
        if bs_code == 7:
            hdr += struct.pack(">H", bs - 1)
        if sr_code == 14:
            hdr += struct.pack(">H", sample_rate // 10)
        hdr.append(_crc8(bytes(hdr)))

        bw = _BitWriter()
        for c in range(nch):
            if mode == "fixed" and bs > 2:
                _write_subframe_fixed2(bw, block[:, c], bps)
            else:
                _write_subframe_verbatim(bw, block[:, c], bps)
        bw.align()
        frame = bytes(hdr) + bw.bytes()
        body += frame + struct.pack(">H", _crc16(frame))

    with open(path, "wb") as f:
        f.write(bytes(header) + bytes(body))
