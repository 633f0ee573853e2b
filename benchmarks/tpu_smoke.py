"""TPU smoke: run every device-facing pipeline once on the real chip.

The test suite runs on CPU (conftest); this script catches TPU-only lowering
or transport issues. Every result is VERIFIED by value readback
(block_until_ready alone hides faults on this transport — CLAUDE.md).
Run: python benchmarks/tpu_smoke.py
"""
from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def check(tag, arr):
    s = float(jnp.sum(jnp.abs(jnp.asarray(arr))))
    assert np.isfinite(s), f"{tag}: non-finite checksum"
    print(f"  {tag}: ok (checksum {s:.1f})")


def main() -> None:
    print("device:", jax.devices()[0])
    from gomel_tpu import Mel, MelConfig, Phase, PhaseConfig
    from gomel_tpu.core.framing import pad_length
    from gomel_tpu.parallel.batch import BatchedMel, BatchedPhase
    from gomel_tpu.parallel.mesh import make_mesh
    from gomel_tpu.pipelines.longform import LongFormPhase
    from gomel_tpu.pipelines.streaming import StreamingMel, StreamingPhase

    sr = 48000
    rng = np.random.default_rng(0)
    t = np.arange(2 * sr) / sr
    audio = (0.4 * np.sin(2 * np.pi * 440 * t)
             + 0.1 * rng.standard_normal(len(t))).astype(np.float32)

    # single-host degenerate multihost bring-up (docs/MULTIHOST.md): the
    # explicit 1-process topology must succeed (or report an already-
    # initialized runtime); the no-arg form is pod-autodetect and can block
    # waiting for a coordinator off-pod, so it is not exercised here
    from gomel_tpu.parallel import mesh as pmesh
    try:
        pmesh.initialize_multihost(coordinator_address="localhost:18476",
                                   num_processes=1, process_id=0)
        print("initialize_multihost (single-host degenerate): ok")
    except RuntimeError as e:
        print(f"initialize_multihost: tolerated ({e})")
    assert not pmesh.is_multihost()

    print("single-chip pipelines:")
    m = Mel(MelConfig.cli_default())
    logmel = m.encode(audio)
    check("mel encode", logmel)
    check("mel decode (GL-2)", m.decode(logmel, seed=0))

    p = Phase(sample_rate=sr)
    spec = p.encode(audio)
    check("phase encode", spec)
    check("phase decode", p.decode(spec))

    print("file round trips (host codecs + device):")
    with tempfile.TemporaryDirectory() as d:
        from gomel_tpu.io.audio import load_wav, save_wav
        save_wav(f"{d}/in.wav", audio, sr)
        m.to_mel_wav(f"{d}/in.wav", f"{d}/m.png")
        m.to_wav_png(f"{d}/m.png", f"{d}/m.wav")
        p.to_phase_wav(f"{d}/in.wav", f"{d}/p.png")
        Phase(sample_rate=sr).to_wav_png(f"{d}/p.png", f"{d}/p.wav")
        rec, _ = load_wav(f"{d}/p.wav")
        n = min(len(rec), len(audio))
        corr = np.corrcoef(audio[4096:n - 4096], rec[4096:n - 4096])[0, 1]
        assert corr > 0.95, corr
        print(f"  file phase roundtrip: ok (corr {corr:.5f})")

    print("batched pipelines:")
    xb = np.stack([audio, audio[::-1]])
    bm = BatchedMel(MelConfig.cli_default())
    check("batched mel encode", bm.encode(
        np.pad(xb, ((0, 0), (0, pad_length(xb.shape[1], 1280) - xb.shape[1])))))
    bp = BatchedPhase(PhaseConfig.cli_default())
    bspec = bp.encode(
        np.pad(xb, ((0, 0), (0, pad_length(xb.shape[1], 1280) - xb.shape[1]))))
    check("batched phase encode", bspec)
    check("batched phase decode", bp.decode(bspec))

    print("streaming pipelines:")
    sp = StreamingPhase(PhaseConfig(num_freqs=768, window=1280, resolut=4096),
                        chunk_frames=32)
    sspec = sp.encode(audio)
    check("streaming phase encode", sspec)
    check("streaming phase decode", sp.decode(sspec))
    sm = StreamingMel(MelConfig.cli_default(), chunk_frames=32)
    check("streaming mel encode", sm.encode(audio))

    print("sharded path (1x1 mesh on the real chip):")
    mesh = make_mesh(data=1, frame=1, devices=jax.devices()[:1])
    lf = LongFormPhase(PhaseConfig(num_freqs=768, window=1280, resolut=4096),
                       mesh)
    lspec = lf.encode(audio)
    check("longform phase encode", lspec)
    check("longform phase decode", lf.decode(lspec))

    print("direct-DFT matmul backend (decode paths):")
    from gomel_tpu.ops import dft_mm
    fx = jnp.asarray(np.pad(audio, (0, pad_length(len(audio), 1280)
                                    - len(audio))), jnp.float32)
    re, im = dft_mm.rfft(fx[:4096], 4096, jax.lax.Precision.HIGH)
    check("dft_mm rfft", re + im)
    check("dft_mm irfft", dft_mm.irfft(re, im, 4096,
                                       jax.lax.Precision.HIGH))

    print("ALL TPU SMOKE CHECKS PASSED")


if __name__ == "__main__":
    main()
