"""Measure the reference Python port head-to-head against this framework.

The reference publishes no performance numbers (SURVEY.md §6), so the only
way to substantiate "matches or beats the reference on its own workload" is
to run the reference port itself (/root/reference/phase.py — pure
numpy/Python, CPU) on this machine and race it against our stack on the
same audio, at both API levels a user actually calls:

- buffer level: to_phase / from_phase (the ML-pipeline hooks,
  /root/reference/phase.py:113-220)
- file level:   to_phase_wav / to_wav_png (the CLI path,
  /root/reference/phase.py:222-349) — includes WAV + PNG codec time.

The Go binaries cannot be raced (no Go toolchain in this image); the port
is the reference's own published PyPI package (`phase-spectrogram`) and is
the implementation its README points ML users at.

Methodology: the reference is single-threaded interpreted Python — one
timed run is representative (repeats shown to confirm). Our file-level
calls force a device read-back internally (np.asarray of the result), so
plain wall-clock per call IS the honest end-to-end number including the
~27 ms axon RTT and host codec work; compile time is excluded by a warm-up
call (steady-state serving). Run from the repo root:

    python benchmarks/exp_reference_cpu.py [--secs 30]
"""
from __future__ import annotations

import argparse
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_DIR = "/root/reference"


def _load_reference():
    """Import the reference port with soundfile/pypng stubbed (the same
    shims tests/conftest.py uses for the golden-oracle suite)."""
    from gomel_tpu.io import wavcodec

    if "soundfile" not in sys.modules:
        sf = types.ModuleType("soundfile")

        def _read(path, dtype="float64"):
            arr, sr = wavcodec.read_wav(path)
            if arr.dtype == np.int16:
                arr = arr.astype(np.float64) / 32768.0
            return arr.astype(dtype), sr

        def _write(path, data, samplerate, subtype="PCM_16"):
            data = np.asarray(data, dtype=np.float64)
            pcm = np.clip(np.rint(data * 32768.0), -32768,
                          32767).astype(np.int16)
            wavcodec.write_wav(path, pcm, int(samplerate))

        sf.read = _read
        sf.write = _write
        sys.modules["soundfile"] = sf
    if "png" not in sys.modules:
        from gomel_tpu.compat import pypng
        sys.modules["png"] = pypng
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import phase as reference_phase
    return reference_phase


def _time(fn, repeats: int = 1) -> float:
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=float, default=30.0)
    ap.add_argument("--outdir", default="/tmp/ref_race")
    args = ap.parse_args()

    os.makedirs(args.outdir, exist_ok=True)
    sr = 48000
    rng = np.random.default_rng(0)
    t = np.arange(int(sr * args.secs)) / sr
    # speech-band content so quantization paths see realistic dynamics
    buf = (0.5 * np.sin(2 * np.pi * 220 * t)
           + 0.3 * np.sin(2 * np.pi * 1187 * t)
           + 0.05 * rng.standard_normal(t.shape)).astype(np.float64)
    buf /= np.max(np.abs(buf)) * 1.01
    audio_s = args.secs

    from gomel_tpu.io import audio as audio_io
    in_wav = os.path.join(args.outdir, "in.wav")
    audio_io.save_wav(in_wav, buf, sr, clip=True)

    ref = _load_reference()
    rows = []

    # ---- reference port (CPU, single thread) ------------------------------
    rp = ref.Phase(sample_rate=sr)
    t_enc = _time(lambda: rp.to_phase(buf), repeats=2)  # pads internally
    spec = rp.to_phase(buf)
    t_dec = _time(lambda: rp.from_phase(spec), repeats=1)  # O(T*4096) loops
    ref_png = os.path.join(args.outdir, "ref.png")
    ref_out = os.path.join(args.outdir, "ref_out.wav")
    t_fenc = _time(lambda: rp.to_phase_wav(in_wav, ref_png), repeats=1)
    t_fdec = _time(lambda: ref.Phase(sample_rate=sr).to_wav_png(
        ref_png, ref_out), repeats=1)
    rows += [("reference port to_phase (buffer)", t_enc),
             ("reference port from_phase (buffer)", t_dec),
             ("reference port to_phase_wav (file)", t_fenc),
             ("reference port to_wav_png (file)", t_fdec)]

    # ---- our stack (device compute + host codecs) --------------------------
    import jax
    from gomel_tpu.pipelines.phase import Phase

    print(f"our backend: {jax.default_backend()} "
          f"({getattr(jax.devices()[0], 'device_kind', '?')})",
          file=sys.stderr)
    ours = Phase(sample_rate=sr, metadata_layout="py", length_mode="py",
                 device_quantize=True)
    our_png = os.path.join(args.outdir, "ours.png")
    our_out = os.path.join(args.outdir, "ours_out.wav")
    ours.to_phase_wav(in_wav, our_png)  # warm-up: compile both directions
    Phase(sample_rate=sr, metadata_layout="py",
          device_quantize=True).to_wav_png(our_png, our_out)
    t_oenc = _time(lambda: ours.to_phase_wav(in_wav, our_png), repeats=3)
    t_odec = _time(lambda: Phase(sample_rate=sr, metadata_layout="py",
                                 device_quantize=True)
                   .to_wav_png(our_png, our_out), repeats=3)
    # buffer level, single call: includes the full host->device upload and
    # the [F, nf, 2] spectrogram read-back. On the axon TUNNEL those
    # transfers dominate (~20 MB over a remote link); on a directly
    # attached chip they ride PCIe/ICI. Reported as the cold-ish latency
    # floor, NOT the serving number.
    enc = ours.encode(buf)
    _ = float(np.asarray(enc).sum())
    t_obenc = _time(lambda: np.asarray(ours.encode(buf)).sum(), repeats=3)
    dspec = np.asarray(enc, dtype=np.float64)
    t_obdec = _time(lambda: np.asarray(ours.decode(dspec)).sum(), repeats=3)
    rows += [("ours encode (buffer, 1 call + read-back)", t_obenc),
             ("ours decode (buffer, 1 call + read-back)", t_obdec),
             ("ours to_phase_wav (file)", t_oenc),
             ("ours to_wav_png (file)", t_odec)]

    # buffer level, steady state: pipelined device throughput (bench.py
    # methodology — what a saturated serving pipeline sees; inputs resident,
    # one scalar read-back amortized over the pipeline)
    import jax.numpy as jnp
    from bench import pipelined_time
    from gomel_tpu.core.framing import pad_length
    from gomel_tpu.ops.phase_ops import phase_encode, phase_decode
    from gomel_tpu.ops.stft import hann_window

    c = ours.config
    n_pad = pad_length(len(buf), c.window)
    xp = np.pad(buf, (0, n_pad - len(buf)))
    win = jnp.asarray(hann_window(c.resolut), jnp.float32)
    pe = jax.jit(lambda x: phase_encode(x, c.num_freqs, c.resolut, c.window,
                                        win))
    pd = jax.jit(lambda s: phase_decode(s, c.resolut, c.window, 0.0, None))
    xs = [jax.device_put(jnp.asarray(xp * s, jnp.float32), jax.devices()[0])
          for s in (1.0, 0.5)]
    specs = [pe(x) for x in xs]
    t_senc = pipelined_time(pe, [(x,) for x in xs], n_lo=8, n_hi=40)
    t_sdec = pipelined_time(pd, [(s,) for s in specs], n_lo=8, n_hi=40)
    rows += [("ours encode (device steady-state)", t_senc),
             ("ours decode (device steady-state)", t_sdec)]

    print(f"\nworkload: {audio_s:.0f} s of 48 kHz audio, single stream")
    print(f"{'path':44s} {'time':>9s} {'audio-s/s':>10s}")
    for name, tt in rows:
        print(f"{name:44s} {tt:8.3f}s {audio_s / tt:10.1f}")

    print(f"\n(reference port is single-threaded; this host has "
          f"{os.cpu_count()} cores — a perfect {os.cpu_count()}-way "
          f"process pool would still be "
          f"{(audio_s / t_senc) / (os.cpu_count() * audio_s / t_enc):.0f}x "
          f"short of one chip's steady-state encode)")
    for tag, o, r in (("encode 1-call latency", t_obenc, t_enc),
                      ("decode 1-call latency", t_obdec, t_dec),
                      ("encode file e2e", t_oenc, t_fenc),
                      ("decode file e2e", t_odec, t_fdec),
                      ("encode steady-state", t_senc, t_enc),
                      ("decode steady-state", t_sdec, t_dec)):
        print(f"speedup vs reference port, {tag:22s}: {r / o:8.1f}x")


if __name__ == "__main__":
    main()
