"""Batch CLI: encode whole directories on TPU with the data-parallel pipeline.

New relative to the reference (whose CLIs process one file per invocation):
``batch-tomel`` / ``batch-tophase`` decode files with the prefetching dataset
loader, group them into length buckets, run the batched device pipeline, and
write the same PNGs the single-file tools produce (per-file true-length
metadata preserved).
"""
from __future__ import annotations

import argparse
import os
import sys
from typing import List, Optional, Sequence

import numpy as np

from ..core.config import MelConfig, PhaseConfig, num_freqs_for_sample_rate, pad_shift
from ..core.framing import frames_for_padded
from ..io import imagecodec
from ..io.dataset import AudioDataset, list_audio_files
from ..ops.resample import zero_stuff_upsample
from ..parallel.batch import BatchedMel, BatchedPhase


def _collect(paths: Sequence[str]) -> List[str]:
    files: List[str] = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(list_audio_files(p))
        else:
            files.append(p)
    return files


def _out_path(path: str, out_dir: Optional[str],
              used: Optional[set] = None) -> str:
    """Output path; with --out-dir, basename collisions between inputs from
    different directories are disambiguated (name-1.png, name-2.png, ...)."""
    base = path + ".png"
    if not out_dir:
        return base
    os.makedirs(out_dir, exist_ok=True)
    name = os.path.basename(base)
    if used is not None:
        candidate = name
        k = 0
        while candidate in used:
            k += 1
            stem, ext = os.path.splitext(name)
            candidate = f"{stem}-{k}{ext}"
        if k:
            print(f"warning: basename collision, writing {candidate}",
                  file=sys.stderr)
        used.add(candidate)
        name = candidate
    return os.path.join(out_dir, name)


def batch_tomel(argv: Optional[Sequence[str]] = None) -> int:
    """Directory/file list -> mel PNGs via the batched pipeline."""
    p = argparse.ArgumentParser(prog="batch-tomel")
    p.add_argument("inputs", nargs="+", help="audio files or directories")
    p.add_argument("--out-dir", default=None)
    p.add_argument("--max-batch", type=int, default=16)
    p.add_argument("--workers", type=int, default=2)
    p.add_argument("--num-mels", type=int, default=192)
    p.add_argument("--window", type=int, default=1280)
    p.add_argument("--resolut", type=int, default=4096)
    p.add_argument("--fmax", type=float, default=16000.0)
    a = p.parse_args(argv)

    cfg = MelConfig(num_mels=a.num_mels, mel_fmax=a.fmax, y_reverse=True,
                    window=a.window, resolut=a.resolut)
    files = _collect(a.inputs)
    if not files:
        print("no input files", file=sys.stderr)
        return 1
    ds = AudioDataset(files, mono="go_concat", flac_scaling="mel",
                      num_workers=a.workers)
    items = [(path, buf, sr) for path, buf, sr in ds]
    bm = BatchedMel(cfg)
    utts = [np.asarray(buf, np.float32) for _, buf, _ in items]
    n_done = 0
    used: set = set()
    for bucket, logmel in bm.encode_buckets(utts, max_batch=a.max_batch):
        spec_np = np.asarray(logmel, dtype=np.float64)
        for row, i in enumerate(bucket.indices):
            path, buf, sr = items[i]
            f = frames_for_padded(len(buf), cfg.window, cfg.resolut)
            spec = spec_np[row, :f]
            imagecodec.save_mel_image(
                _out_path(path, a.out_dir, used), spec, cfg.y_reverse,
                float(len(buf)) / f, float(sr))
            n_done += 1
    print(f"encoded {n_done} files", file=sys.stderr)
    return 0


def batch_tophase(argv: Optional[Sequence[str]] = None) -> int:
    """Directory/file list -> phase PNGs (files grouped per sample-rate
    family; zero-stuff upsampling applied per file)."""
    p = argparse.ArgumentParser(prog="batch-tophase")
    p.add_argument("inputs", nargs="+", help="audio files or directories")
    p.add_argument("--out-dir", default=None)
    p.add_argument("--max-batch", type=int, default=16)
    p.add_argument("--workers", type=int, default=2)
    p.add_argument("--window", type=int, default=1280)
    p.add_argument("--resolut", type=int, default=4096)
    p.add_argument("--hdr", action="store_true")
    p.add_argument("--ihs", action="store_true")
    a = p.parse_args(argv)

    files = _collect(a.inputs)
    if not files:
        print("no input files", file=sys.stderr)
        return 1
    ds = AudioDataset(files, mono="go_concat", flac_scaling="phase",
                      num_workers=a.workers)
    groups: dict[int, list] = {}
    for path, buf, sr in ds:
        try:
            nf = num_freqs_for_sample_rate(int(sr), hdr=a.hdr)
        except Exception as e:
            print(f"skipping {path}: {e}", file=sys.stderr)
            continue
        zp, zs = pad_shift(int(sr))
        original = len(buf)
        if zp > 0:
            buf = np.asarray(zero_stuff_upsample(buf, zp, zs))
        groups.setdefault(nf, []).append((path, buf, original, sr))

    n_done = 0
    used: set = set()
    for nf, items in groups.items():
        cfg = PhaseConfig(num_freqs=nf, window=a.window, resolut=a.resolut,
                          y_reverse=True, ihs=a.ihs, hdr=a.hdr)
        bp = BatchedPhase(cfg)
        utts = [np.asarray(buf, np.float32) for _, buf, _, _ in items]
        for bucket, spec in bp.encode_buckets(utts, max_batch=a.max_batch):
            spec_np = np.asarray(spec, dtype=np.float64)
            for row, i in enumerate(bucket.indices):
                path, buf, original, sr = items[i]
                f = frames_for_padded(len(buf), cfg.window, cfg.resolut)
                s = spec_np[row, :f]
                # samples_in_mel uses the PRE-upsample length (Go semantics,
                # phase/phase.go:202-215)
                imagecodec.save_phase_image(
                    _out_path(path, a.out_dir, used), s, cfg.y_reverse,
                    float(original) / f, float(sr), cfg.ihs_passes, cfg.hdr,
                    layout="go")
                n_done += 1
    print(f"encoded {n_done} files", file=sys.stderr)
    return 0

