"""Mel file-path device-quantize A/B + batch directory throughput A/B.

VERDICT r4 #1/#2 done-criteria:
- single-stream mel file e2e rows comparable to phase's +57%/2.0x
  (to_mel_wav / to_wav_png, host vs device quantize, real chip,
  best-of-N interleaved);
- directory throughput (files/s) A/B for the batch CLIs with and without
  --device-quantize (the batch surface is the throughput story).

Usage: python benchmarks/exp_mel_filepath.py [--secs 30] [--runs 4]
       [--batch-files 8] [--batch-secs 6]
Markdown rows to stdout (paste into RESULTS.md).
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gomel_tpu.core.config import MelConfig  # noqa: E402
from gomel_tpu.io.audio import save_wav  # noqa: E402
from gomel_tpu.pipelines.mel import Mel  # noqa: E402


def _best(fn, runs):
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def single_stream(secs, runs, d):
    sr = 44100
    rng = np.random.default_rng(0)
    t = np.arange(int(secs * sr)) / sr
    audio = (0.4 * np.sin(2 * np.pi * 440 * t)
             + 0.1 * rng.standard_normal(t.shape))
    wav = os.path.join(d, "in.wav")
    save_wav(wav, audio, sr)
    host = Mel(MelConfig.cli_default())
    dev = Mel(MelConfig.cli_default(), device_quantize=True)
    png_h, png_d = os.path.join(d, "h.png"), os.path.join(d, "q.png")
    host.to_mel_wav(wav, png_h)   # warm both jits
    dev.to_mel_wav(wav, png_d)
    host.to_wav_png(png_h, os.path.join(d, "h.wav"))
    dev.to_wav_png(png_d, os.path.join(d, "q.wav"))

    rows = []
    # interleaved best-of-N (shared-chip noise policy, CLAUDE.md)
    enc_h = enc_d = dec_h = dec_d = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        host.to_mel_wav(wav, png_h)
        enc_h = min(enc_h, time.perf_counter() - t0)
        t0 = time.perf_counter()
        dev.to_mel_wav(wav, png_d)
        enc_d = min(enc_d, time.perf_counter() - t0)
        t0 = time.perf_counter()
        host.to_wav_png(png_h, os.path.join(d, "h.wav"))
        dec_h = min(dec_h, time.perf_counter() - t0)
        t0 = time.perf_counter()
        dev.to_wav_png(png_d, os.path.join(d, "q.wav"))
        dec_d = min(dec_d, time.perf_counter() - t0)
    rows.append(("to_mel_wav", enc_h, enc_d))
    rows.append(("to_wav_png (GL-2)", dec_h, dec_d))
    return rows


def batch_throughput(n_files, secs, runs, d, which="all"):
    from gomel_tpu.cli.batch import batch_fromphase, batch_tomel, \
        batch_tophase, batch_towav
    sr = 48000
    rng = np.random.default_rng(1)
    wav_dir = os.path.join(d, "wavs")
    os.makedirs(wav_dir, exist_ok=True)
    # IDENTICAL lengths -> one bucket shape -> one compile per program
    # (the compile tax is minutes/program on the tunnel; a mixed-length
    # corpus only adds compiles, not information)
    for k in range(n_files):
        t = np.arange(int(secs * sr)) / sr
        a = (0.4 * np.sin(2 * np.pi * (200 + 37 * k) * t)
             + 0.05 * rng.standard_normal(t.shape))
        save_wav(os.path.join(wav_dir, f"u{k}.wav"), a, sr)
    mb = ["--max-batch", str(n_files)]

    def run_pair(tool, args_host, args_dev):
        tool(args_host)  # warm (compiles)
        tool(args_dev)
        th = td = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            assert tool(args_host) == 0
            th = min(th, time.perf_counter() - t0)
            t0 = time.perf_counter()
            assert tool(args_dev) == 0
            td = min(td, time.perf_counter() - t0)
        return th, td

    rows = []
    p_h, p_d = os.path.join(d, "p_h"), os.path.join(d, "p_d")
    if which in ("all", "phase"):
        th, td = run_pair(
            batch_tophase,
            [wav_dir, "--out-dir", p_h, "--host-quantize"] + mb,
            [wav_dir, "--out-dir", p_d, "--device-quantize"] + mb)
        rows.append(("batch-tophase", n_files, th, td))
        th, td = run_pair(
            batch_fromphase,
            [p_h, "--out-dir", os.path.join(d, "w_h"),
             "--host-quantize"] + mb,
            [p_d, "--out-dir", os.path.join(d, "w_d"),
             "--device-quantize"] + mb)
        rows.append(("batch-fromphase", n_files, th, td))
    if which in ("all", "mel"):
        m_h, m_d = os.path.join(d, "m_h"), os.path.join(d, "m_d")
        th, td = run_pair(
            batch_tomel,
            [wav_dir, "--out-dir", m_h, "--host-quantize"] + mb,
            [wav_dir, "--out-dir", m_d, "--device-quantize"] + mb)
        rows.append(("batch-tomel", n_files, th, td))
        th, td = run_pair(
            batch_towav,
            [m_h, "--out-dir", os.path.join(d, "mw_h"),
             "--host-quantize"] + mb,
            [m_d, "--out-dir", os.path.join(d, "mw_d"),
             "--device-quantize"] + mb)
        rows.append(("batch-towav (GL-2)", n_files, th, td))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=float, default=30.0)
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--batch-files", type=int, default=8)
    ap.add_argument("--batch-secs", type=float, default=6.0)
    ap.add_argument("--skip-single", action="store_true")
    ap.add_argument("--skip-batch", action="store_true")
    ap.add_argument("--batch-which", choices=("all", "phase", "mel"),
                    default="all")
    a = ap.parse_args()
    with tempfile.TemporaryDirectory() as d:
        if not a.skip_single:
            rows = single_stream(a.secs, a.runs, d)
            print(f"\n## mel single-stream file e2e ({a.secs:.0f} s, "
                  f"CLI config, best of {a.runs} interleaved)\n")
            print("| path | host quantize | device quantize | win |")
            print("|---|---|---|---|")
            for name, th, td in rows:
                print(f"| {name} | {th:.3f} s | {td:.3f} s | "
                      f"**{(th / td - 1) * 100:+.0f}%** |", flush=True)
        if a.skip_batch:
            return
        brows = batch_throughput(a.batch_files, a.batch_secs, a.runs, d,
                                 which=a.batch_which)
        print(f"\n## batch directory throughput ({a.batch_files} files x "
              f"{a.batch_secs:.0f} s, best of {a.runs} interleaved)\n")
        print("| tool | host files/s | devq files/s | win |")
        print("|---|---|---|---|")
        for name, n, th, td in brows:
            print(f"| {name} | {n / th:.2f} | {n / td:.2f} | "
                  f"**{(th / td - 1) * 100:+.0f}%** |")


if __name__ == "__main__":
    main()
