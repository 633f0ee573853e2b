"""Long-file single-chip file e2e: the regime the framework targets.

Measures WAV -> PNG (to_phase_wav) and PNG -> WAV (to_wav_png) wall-clock
for multi-minute files at the CLI config, host vs device quantize —
the end-to-end number an hour-scale user sees, with the chunked analysis
(ops/stft frame_chunk), Z_RLE deflate, fused (de)quantization, and
PCM-16 readback all in play.

Usage: python benchmarks/exp_longfile_e2e.py [--minutes 10] [--runs 2]
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gomel_tpu.io.audio import save_wav  # noqa: E402
from gomel_tpu.pipelines.phase import Phase  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=10.0)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--devq-only", action="store_true",
                    help="skip the host-quantize legs (cliff checks at "
                         "hour scale where the host legs take minutes)")
    a = ap.parse_args()
    sr = 48000
    secs = a.minutes * 60.0
    rng = np.random.default_rng(0)
    t = np.arange(int(secs * sr)) / sr
    audio = (0.4 * np.sin(2 * np.pi * 440 * t)
             + 0.1 * rng.standard_normal(t.shape))
    with tempfile.TemporaryDirectory() as d:
        wav = os.path.join(d, "in.wav")
        save_wav(wav, audio, sr)
        print(f"{a.minutes:.0f}-minute file ({secs:.0f} audio-s @ 48 kHz)")
        print("| path | host quantize | device quantize | win | devq a-s/s |")
        print("|---|---|---|---|---|")
        host = Phase(sample_rate=sr)
        dev = Phase(sample_rate=sr, device_quantize=True)
        png_h, png_d = os.path.join(d, "h.png"), os.path.join(d, "q.png")
        if not a.devq_only:
            host.to_phase_wav(wav, png_h)  # warm compiles
        dev.to_phase_wav(wav, png_d)
        eh = ed = float("inf")
        for _ in range(a.runs):
            if not a.devq_only:
                t0 = time.perf_counter()
                host.to_phase_wav(wav, png_h)
                eh = min(eh, time.perf_counter() - t0)
            t0 = time.perf_counter()
            dev.to_phase_wav(wav, png_d)
            ed = min(ed, time.perf_counter() - t0)
        hcol = "-" if a.devq_only else f"{eh:.2f} s"
        wcol = "-" if a.devq_only else f"{(eh / ed - 1) * 100:+.0f}%"
        print(f"| to_phase_wav | {hcol} | {ed:.2f} s | "
              f"{wcol} | {secs / ed:.0f} |", flush=True)
        out_h, out_d = os.path.join(d, "h.wav"), os.path.join(d, "q.wav")
        if not a.devq_only:
            host.to_wav_png(png_h, out_h)  # warm
        dev.to_wav_png(png_d, out_d)
        dh = dd = float("inf")
        for _ in range(a.runs):
            if not a.devq_only:
                t0 = time.perf_counter()
                host.to_wav_png(png_h, out_h)
                dh = min(dh, time.perf_counter() - t0)
            t0 = time.perf_counter()
            dev.to_wav_png(png_d, out_d)
            dd = min(dd, time.perf_counter() - t0)
        hcol = "-" if a.devq_only else f"{dh:.2f} s"
        wcol = "-" if a.devq_only else f"{(dh / dd - 1) * 100:+.0f}%"
        print(f"| to_wav_png | {hcol} | {dd:.2f} s | "
              f"{wcol} | {secs / dd:.0f} |", flush=True)


if __name__ == "__main__":
    main()
