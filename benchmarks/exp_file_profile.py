"""Stage-level profile of the FILE e2e paths + deflate strategy race.

VERDICT r4 #4: after device-quantize, single-stream file time is ~98%
host work — but WHERE? This experiment times every stage of
to_phase_wav / to_wav_png (and the mel pair) separately, then races the
only tunable hot stage that remains host-bound (the IDAT deflate) across
zlib (level, strategy) settings on REAL quantized spectrogram planes.

Note the write-side scanline filter already runs in C++
(native/pngfilter.cpp png_filter_up) and this container has ONE CPU core
(CLAUDE.md), so strip-parallel deflate cannot win here — the lever is the
zlib strategy: Z_RLE only run-length-codes the filtered scanlines, which
is typically several times faster than the default Huffman+LZ77 at a
modest size cost. PNG stays lossless under any (level, strategy): readers
are unaffected; only the encoded byte stream changes.

Usage: python benchmarks/exp_file_profile.py [--secs 30] [--runs 5]
Writes markdown rows to stdout (paste into RESULTS.md).
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gomel_tpu.core.config import MelConfig, PhaseConfig  # noqa: E402
from gomel_tpu.io import imagecodec  # noqa: E402
from gomel_tpu.io.audio import load_wav, save_wav  # noqa: E402
from gomel_tpu.io.pngcodec import read_png, write_png  # noqa: E402
from gomel_tpu.pipelines.mel import Mel  # noqa: E402
from gomel_tpu.pipelines.phase import Phase  # noqa: E402


def _t(fn, runs):
    """best-of-N wall time (host stages; device stages force a read-back)"""
    best = float("inf")
    out = None
    for _ in range(runs):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best, out


def profile_phase(secs, runs, d):
    sr = 48000
    rng = np.random.default_rng(0)
    t = np.arange(int(secs * sr)) / sr
    audio = (0.4 * np.sin(2 * np.pi * 440 * t)
             + 0.1 * rng.standard_normal(t.shape))
    wav_in = os.path.join(d, "in.wav")
    save_wav(wav_in, audio, sr)
    p = Phase(sample_rate=sr, device_quantize=True)
    png = os.path.join(d, "p.png")
    p.to_phase_wav(wav_in, png)  # warm the jits + caches

    rows = []
    # ---- encode side --------------------------------------------------
    tm, (buf, _) = _t(lambda: load_wav(wav_in, mono="left"), runs)
    rows.append(("phase.enc load_wav", tm))
    tm, q = _t(lambda: jax.tree.map(np.asarray,
                                    p.encode_quantized(buf)), runs)
    rows.append(("phase.enc device encode+quantize+readback", tm))
    img2, maxs, mins = q
    tm, _ = _t(lambda: imagecodec.save_phase_image_quantized(
        os.path.join(d, "s.png"), img2, maxs, mins, True,
        float(len(buf)) / img2.shape[1], float(sr), False), runs)
    rows.append(("phase.enc assemble+filter+deflate+write", tm))
    # deflate share of the save
    nf, n_frames = img2.shape[0], img2.shape[1]
    img = np.zeros((nf, n_frames, 4), dtype=np.uint8)
    img[:, :, 0] = img2[:, :, 0]
    img[:, :, 1] = img2[:, :, 1]
    img[:, :, 2] = ((-img2[:, :, 0].astype(np.int64)) & 255).astype(np.uint8)
    img[:, :, 3] = 255
    body = img.tobytes()
    rowbytes = len(body) // nf
    from gomel_tpu.io._native import get_lib
    lib = get_lib()
    raw = np.empty(nf * (rowbytes + 1), dtype=np.uint8)
    src = np.ascontiguousarray(np.frombuffer(body, np.uint8).reshape(
        nf, rowbytes))
    tm, _ = _t(lambda: lib.png_filter_up(src.ctypes.data, raw.ctypes.data,
                                         nf, rowbytes), runs)
    rows.append(("phase.enc   - scanline filter (C++)", tm))
    raw_bytes = raw.tobytes()
    tm, _ = _t(lambda: zlib.compress(raw_bytes, 3), runs)
    rows.append(("phase.enc   - deflate level 3 (current)", tm))

    # ---- decode side ---------------------------------------------------
    tm, _ = _t(lambda: read_png(png), runs)
    rows.append(("phase.dec read+inflate+unfilter", tm))
    tm, loaded = _t(lambda: imagecodec.load_phase_image_raw(
        png, True, False), runs)
    rows.append(("phase.dec full raw load (incl. above)", tm))
    planes, mx, mn, samples, srr, nfr = loaded
    tm, _ = _t(lambda: np.asarray(
        p.decode_quantized(planes, mx, mn)), runs)
    rows.append(("phase.dec device decode+readback", tm))
    wav_out = os.path.join(d, "o.wav")
    tm, _ = _t(lambda: p.to_wav_png(png, wav_out), runs)
    rows.append(("phase.dec FULL to_wav_png", tm))
    tm, _ = _t(lambda: p.to_phase_wav(wav_in, png), runs)
    rows.append(("phase.enc FULL to_phase_wav", tm))
    return rows, raw_bytes


def profile_mel(secs, runs, d):
    sr = 44100
    rng = np.random.default_rng(1)
    t = np.arange(int(secs * sr)) / sr
    audio = (0.4 * np.sin(2 * np.pi * 440 * t)
             + 0.1 * rng.standard_normal(t.shape))
    wav_in = os.path.join(d, "m_in.wav")
    save_wav(wav_in, audio, sr)
    m = Mel(MelConfig.cli_default(), device_quantize=True)
    png = os.path.join(d, "m.png")
    m.to_mel_wav(wav_in, png)  # warm

    rows = []
    tm, (buf, _) = _t(lambda: load_wav(wav_in, mono="left"), runs)
    rows.append(("mel.enc load_wav", tm))
    tm, q = _t(lambda: jax.tree.map(np.asarray, m.encode_quantized(buf)),
               runs)
    rows.append(("mel.enc device encode+quantize+readback", tm))
    img2, mx, mn = q
    tm, _ = _t(lambda: imagecodec.save_mel_image_quantized(
        os.path.join(d, "ms.png"), img2, float(mx), float(mn), True,
        float(len(buf)) / img2.shape[1], float(sr)), runs)
    rows.append(("mel.enc assemble+filter+deflate+write", tm))
    tm, _ = _t(lambda: m.to_mel_wav(wav_in, png), runs)
    rows.append(("mel.enc FULL to_mel_wav", tm))
    tm, _ = _t(lambda: m.to_wav_png(png, os.path.join(d, "mo.wav")), runs)
    rows.append(("mel.dec FULL to_wav_png (GL-2)", tm))
    return rows


def race_deflate(raw_bytes, runs):
    """(level, strategy) race on the real filtered scanline stream."""
    rows = []
    base = None
    for name, level, strategy in [
            ("level 1", 1, zlib.Z_DEFAULT_STRATEGY),
            ("level 3 (current)", 3, zlib.Z_DEFAULT_STRATEGY),
            ("level 6", 6, zlib.Z_DEFAULT_STRATEGY),
            ("level 1 + Z_FILTERED", 1, zlib.Z_FILTERED),
            ("level 3 + Z_FILTERED", 3, zlib.Z_FILTERED),
            ("level 1 + Z_RLE", 1, zlib.Z_RLE),
            ("level 6 + Z_RLE", 6, zlib.Z_RLE),
            ("level 0 (store)", 0, zlib.Z_DEFAULT_STRATEGY),
    ]:
        def comp():
            c = zlib.compressobj(level, zlib.DEFLATED, 15, 8, strategy)
            return c.compress(raw_bytes) + c.flush()
        tm, out = _t(comp, runs)
        if base is None:
            pass
        rows.append((name, tm, len(out)))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=float, default=30.0)
    ap.add_argument("--runs", type=int, default=5)
    a = ap.parse_args()
    with tempfile.TemporaryDirectory() as d:
        rows, raw_bytes = profile_phase(a.secs, a.runs, d)
        rows += profile_mel(a.secs, a.runs, d)
        print(f"\n## file e2e stage profile ({a.secs:.0f} s audio, "
              f"best of {a.runs})\n")
        print("| stage | ms |")
        print("|---|---|")
        for name, tm in rows:
            print(f"| {name} | {tm * 1e3:.1f} |")
        print(f"\n## deflate race on the filtered phase scanline stream "
              f"({len(raw_bytes) / 1e6:.1f} MB raw)\n")
        print("| setting | ms | bytes | vs level-3 size |")
        print("|---|---|---|---|")
        dr = race_deflate(raw_bytes, a.runs)
        ref_size = [r for r in dr if "current" in r[0]][0][2]
        for name, tm, size in dr:
            print(f"| {name} | {tm * 1e3:.1f} | {size} | "
                  f"{size / ref_size:+.1%} |".replace("+", ""))


if __name__ == "__main__":
    main()
