"""Roofline / MFU accounting for the hot paths (VERDICT weak #8).

For each serving-shape pipeline (mel encode, Griffin-Lim decode, phase
encode, phase decode) this script reports:

  - algorithmic FLOPs and HBM bytes from XLA's own post-fusion cost model
    (``compiled.cost_analysis()`` — nominal f32-equivalent FLOPs of the
    optimized HLO, verified against a hand count for mel encode below),
  - measured steady-state time per call (bench.py pipelined-slope method),
  - achieved TFLOP/s and GB/s, and their fraction of the chip's peaks,
  - the executed-FLOP inflation where matmuls run multi-pass bf16
    (Precision.HIGHEST = 6 bf16 passes per f32-equivalent matmul,
    HIGH = 3; see benchmarks/RESULTS.md precision ladders).

Peaks (TPU v5e, public spec): 197 TFLOP/s bf16 MXU, 819 GB/s HBM. The
HBM figure matches this environment: a pure streaming op measured
860 GB/s here (CLAUDE.md sanity anchor).

Reading the result: fraction-of-peak for FLOPs ("algorithmic MFU") is
intentionally conservative — it charges the ideal-arithmetic count
against the full-speed peak. Multiply by the pass factor to see how hard
the MXU actually works. "bytes" is XLA's post-fusion operand-access sum;
it counts VMEM-resident traffic too, so it upper-bounds HBM traffic — an
apparent bandwidth ABOVE the HBM spec is direct evidence the working set
stays VMEM-resident (the batch-2 serving-shape design goal, RESULTS.md).

Measured on TPU v5e (2026-08-17, serving shape batch 2 x 30 s):
  path            a-s/s   GFLOP   TFLOP/s (alg.)  op-GB/s  true-I/O GB/s
  mel encode      76.7k     8.4   10.8  (5.5%)      1676      19  (2.3%)
  GL(2) decode    20.3k   239.2   81.0  (41%)       1099       5  (0.6%)
  phase encode   77-99k     4.9    6-8  (3-4%)      1590      65  (8%)
  phase decode   41-48k     9.1    6-7  (3-4%)      1490      27  (3%)
Interpretation: true HBM I/O is 0.6-8% of spec everywhere — nothing is
HBM-bound at the serving shape, by design (VMEM-resident intermediates;
op-bytes/time at ~2x the HBM spec is only possible from VMEM). The
CT/irfft paths are therefore bound by ON-CHIP work: the FFT's non-matmul
stages (windowing, twiddle, magnitude, layout changes) on the vector
unit plus VMEM traffic; executed MFU counting the 6 bf16 HIGHEST passes
is ~21% for mel encode. Cutting passes is a measured dead end (encode
precision ladder, RESULTS.md). GL decode's direct-DFT trades ~28x the
FLOPs for minimal traffic and reaches 41% MFU (nominal = executed:
interior iterations are single-pass bf16) — genuinely compute-bound,
within ~2.4x of the absolute MXU ceiling.

Run from the repo root (TPU via the axon tunnel):
    python benchmarks/roofline.py
"""
from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax
import jax.numpy as jnp
import numpy as np

PEAK_BF16_FLOPS = 197e12  # TPU v5e MXU peak (bf16)
PEAK_HBM_BPS = 819e9      # TPU v5e HBM bandwidth


def compiled_costs(jitted, *args) -> tuple[float, float]:
    """(flops, bytes accessed) from XLA's cost model of the optimized HLO."""
    ca = jitted.lower(*args).compile().cost_analysis()
    d = ca[0] if isinstance(ca, (list, tuple)) else ca
    return float(d.get("flops", 0.0)), float(d.get("bytes accessed", 0.0))


def hand_count_mel_encode(n_frames: int, n: int, num_mels: int) -> float:
    """Independent FLOP count for mel encode, to cross-check XLA's model.

    Per frame (N = frame length, CT split (N1, N2) = mxu_fft._split(N) —
    the shipped 32x128 measured override at N=4096, K2 = N/2/N2+1):
      window            N mul
      CT stage 1        2 real matmuls  [N1,N2]x[N2,N2]  -> 2*2*N1*N2*N2
      twiddle           6*N1*N2 (complex elementwise)
      CT stage 3        4 real matmuls  [K1=N2,N1]x[N1,K2] -> 4*2*N2*N1*K2
      |.|               ~4*(N/2+1)  (sq, sq, add, sqrt)
      mel matmul        extended-weight single matmul: 2*(N/2+1)*(2*mels)
                        (contraction over all N/2+1 rfft bins — ~0.05% more
                        than the 2-channel form's 2*2*(N/2)*mels)
      log-normalize     ~2*num_mels*2
    """
    from gomel_tpu.ops.mxu_fft import _split
    n1, n2 = _split(n)
    k2 = (n // 2) // n2 + 1
    per_frame = (
        n
        + 2 * 2 * n1 * n2 * n2
        + 6 * n1 * n2
        + 4 * 2 * n2 * n1 * k2
        + 4 * (n // 2 + 1)
        + 2 * (n // 2 + 1) * (2 * num_mels)
        + 4 * num_mels
    )
    return float(n_frames * per_frame)


def io_bytes(out, *args) -> float:
    """True HBM I/O lower bound: input + output array bytes (everything in
    between can stay on-chip; XLA's "bytes accessed" cannot separate VMEM
    from HBM traffic, this can bound it from below)."""
    leaves = jax.tree_util.tree_leaves((out, args))
    return float(sum(x.size * x.dtype.itemsize for x in leaves))


def report(name: str, flops: float, nbytes: float, hbm_io: float, secs: float,
           audio_s: float, pass_note: str) -> None:
    tflops = flops / secs / 1e12
    gbps = nbytes / secs / 1e9
    print(f"{name:24s} {audio_s / secs:8.0f} a-s/s   "
          f"{flops / 1e9:7.2f} GFLOP  {nbytes / 1e6:7.1f} MB   "
          f"{tflops:6.2f} TFLOP/s ({100 * tflops * 1e12 / PEAK_BF16_FLOPS:4.1f}% peak)   "
          f"{gbps:5.0f} GB/s op-bytes   "
          f"{hbm_io / secs / 1e9:4.1f} GB/s true-I/O "
          f"({100 * hbm_io / secs / PEAK_HBM_BPS:4.1f}% HBM)   {pass_note}")


def main() -> None:
    import bench
    from gomel_tpu.core.config import MelConfig, PhaseConfig
    from gomel_tpu.core.filterbank import inverse_mel_weights, mel_weights
    from gomel_tpu.core.framing import pad_length
    from gomel_tpu.ops.mel_ops import mel_decode, mel_encode_batch
    from gomel_tpu.ops.phase_ops import phase_decode, phase_encode
    from gomel_tpu.ops.stft import hann_window

    cfg = MelConfig.cli_default()
    sr, secs, batch = 48000, 30.0, 2  # serving shape (benchmarks/RESULTS.md)
    n = pad_length(int(sr * secs), cfg.window)
    audio_s = batch * n / sr
    n_frames = (n - cfg.resolut) // cfg.window + 1

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}   "
          f"shape: batch {batch} x {secs:.0f} s @ {sr} Hz "
          f"({audio_s:.0f} audio-s/call)")
    print(f"peaks: {PEAK_BF16_FLOPS / 1e12:.0f} TFLOP/s bf16, "
          f"{PEAK_HBM_BPS / 1e9:.0f} GB/s HBM")
    print("note: bytes = XLA post-fusion operand accesses; counts "
          "VMEM-resident traffic, so >100% of HBM spec means the working "
          "set stays in VMEM\n")

    fwd = jnp.asarray(mel_weights(cfg.n_bins, cfg.num_mels, cfg.mel_fmin,
                                  cfg.mel_fmax), jnp.float32)
    window = jnp.asarray(hann_window(cfg.resolut), jnp.float32)

    step = jax.jit(lambda xb: mel_encode_batch(
        xb, cfg.num_mels, cfg.resolut, cfg.window, fwd, window))
    rng = np.random.default_rng(0)
    xbs = [jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)
           for _ in range(2)]

    flops, nbytes = compiled_costs(step, xbs[0])
    hand = hand_count_mel_encode(batch * n_frames, cfg.resolut, cfg.num_mels)
    t = bench.pipelined_time(step, [(x,) for x in xbs], n_lo=20, n_hi=120)
    report("mel encode", flops, nbytes, io_bytes(step(xbs[0]), xbs[0]), t,
           audio_s, "FFT matmuls HIGHEST (6x bf16 passes)")
    print(f"{'':24s} hand count {hand / 1e9:.2f} GFLOP "
          f"(XLA/hand = {flops / hand:.2f}) — cost model cross-checked")

    inv = jnp.asarray(inverse_mel_weights(cfg.n_bins, cfg.num_mels,
                                          cfg.mel_fmin, cfg.mel_fmax),
                      jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    logmels = [step(x) for x in xbs]
    gl = jax.jit(jax.vmap(
        lambda s, k: mel_decode(s, cfg.resolut, cfg.window, inv,
                                cfg.griffin_lim_iterations, k, 1.0, 0.0,
                                None)))
    flops, nbytes = compiled_costs(gl, logmels[0], keys)
    t = bench.pipelined_time(gl, [(m, keys) for m in logmels], n_lo=5, n_hi=25)
    report(f"griffin-lim({cfg.griffin_lim_iterations}) decode", flops, nbytes,
           io_bytes(gl(logmels[0], keys), logmels[0], keys), t, audio_s,
           "interior mm-DEFAULT (1x), final XLA irfft")

    pc = PhaseConfig.cli_default()
    pwin = jnp.asarray(hann_window(pc.resolut), jnp.float32)
    pe = jax.jit(jax.vmap(lambda x: phase_encode(
        x, pc.num_freqs, pc.resolut, pc.window, pwin)))
    pd = jax.jit(jax.vmap(lambda s: phase_decode(
        s, pc.resolut, pc.window, 0.0, None)))
    specs = [pe(x) for x in xbs]
    flops, nbytes = compiled_costs(pe, xbs[0])
    t = bench.pipelined_time(pe, [(x,) for x in xbs], n_lo=8, n_hi=40)
    report("phase encode", flops, nbytes, io_bytes(specs[0], xbs[0]), t,
           audio_s, "FFT matmuls HIGHEST (6x bf16 passes)")
    flops, nbytes = compiled_costs(pd, specs[0])
    t = bench.pipelined_time(pd, [(s,) for s in specs], n_lo=8, n_hi=40)
    report("phase decode", flops, nbytes, io_bytes(pd(specs[0]), specs[0]), t,
           audio_s, "XLA native irfft (vector unit)")


if __name__ == "__main__":
    main()
