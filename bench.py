"""Headline benchmark: mel-extraction throughput (audio-seconds/s per chip).

Target (BASELINE.json north star): >= 10,000 audio-seconds/s per chip for
mel extraction at the reference CLI config (NumMels=192, Window=1280,
Resolut=4096, fmax=16k; /root/reference/cmd/tomel/main.go:24-31).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
Extra diagnostics (Griffin-Lim inversion, phase round trip) go to stderr.

Timing methodology (see benchmarks/RESULTS.md "Timing methodology"):
the axon runtime defers device execution until a value is actually read
back (jax.block_until_ready returns early), and the read-back round trip
costs ~27 ms. Each measurement therefore pipelines N back-to-back calls
over alternating inputs (alternation defeats the runtime's same-input
memoization) and forces execution with a jitted-scalar read of the final
output; per-call time is the slope between a small-N and large-N run,
which cancels the constant read-back latency. This measures steady-state
device throughput — the number a saturated serving pipeline sees.
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_AUDIO_S_PER_S = 10_000.0

_checksum = jax.jit(lambda y: jnp.sum(y))


def _read(out) -> float:
    """Force execution of everything enqueued before ``out`` and return a
    checksum of ``out`` (value read-back is the only reliable execution
    barrier on this runtime)."""
    return float(_checksum(out))


def pipelined_time(fn, argsets, n_lo: int, n_hi: int, trials: int = 3) -> float:
    """Seconds per call at steady state: slope between n_lo- and n_hi-call
    pipelined runs (constant read-back latency cancels)."""
    for a in argsets:  # warm up compilation and verify finiteness
        if not np.isfinite(_read(fn(*a))):
            raise RuntimeError("benchmark kernel produced non-finite output")

    def run(n: int) -> float:
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(*argsets[i % len(argsets)])
        _read(out)
        return time.perf_counter() - t0

    t_lo = min(run(n_lo) for _ in range(trials))
    t_hi = min(run(n_hi) for _ in range(trials))
    per = (t_hi - t_lo) / (n_hi - n_lo)
    if per <= 0:  # noise floor: fall back to the conservative estimate
        per = t_hi / n_hi
    return per


def main() -> None:
    from gomel_tpu.core.config import MelConfig, PhaseConfig
    from gomel_tpu.core.filterbank import inverse_mel_weights, mel_weights
    from gomel_tpu.core.framing import pad_length
    from gomel_tpu.ops.mel_ops import mel_decode, mel_encode_batch
    from gomel_tpu.ops.phase_ops import phase_decode, phase_encode
    from gomel_tpu.ops.stft import hann_window

    cfg = MelConfig.cli_default()
    sr = 48000
    secs = 30.0
    # batch sweep (benchmarks/RESULTS.md): throughput per audio-second is
    # highest at SMALL batch — 2 x 30 s rows keep the big [F, 4096]
    # intermediates VMEM-resident (~37 MB) instead of spilling to HBM
    # (batch 2: ~76k a-s/s vs batch 8: ~46k on mel encode; every decode
    # path is faster at batch 2 as well)
    batch = 2

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)

    n = pad_length(int(sr * secs), cfg.window)
    audio_s = batch * n / sr

    fwd = jnp.asarray(
        mel_weights(cfg.n_bins, cfg.num_mels, cfg.mel_fmin, cfg.mel_fmax),
        dtype=jnp.float32)
    window = jnp.asarray(hann_window(cfg.resolut), dtype=jnp.float32)

    # batch-explicit encode: +4-20% over jit(vmap(mel_encode)) on v5e
    # depending on ambient load (ops/mel_ops.py; RESULTS.md recalibration)
    @jax.jit
    def step(xb):
        return mel_encode_batch(xb, cfg.num_mels, cfg.resolut, cfg.window,
                                fwd, window)

    rng = np.random.default_rng(0)
    xbs = [jax.device_put(
        jnp.asarray(rng.standard_normal((batch, n)), dtype=jnp.float32), dev)
        for _ in range(2)]

    # verify the kernel actually ran by value (block_until_ready hides
    # device faults AND defers execution on the axon tunnel — CLAUDE.md)
    checksum = _read(step(xbs[0]))
    print(f"output checksum: {checksum:.4f}", file=sys.stderr)

    best = pipelined_time(step, [(x,) for x in xbs], n_lo=20, n_hi=120)
    value = audio_s / best
    print(f"mel encode: {best * 1e3:.2f}ms/call, {value:.0f} audio-s/s",
          file=sys.stderr)

    # roofline diagnostic (full accounting: benchmarks/roofline.py) — XLA's
    # own cost model of the optimized HLO; bytes counts VMEM-resident
    # traffic too, so an apparent bandwidth above the 819 GB/s HBM spec
    # means the working set stays in VMEM
    try:
        ca = step.lower(xbs[0]).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        fl, by = float(ca.get("flops", 0)), float(ca.get("bytes accessed", 0))
        print(f"roofline: {fl / best / 1e12:.1f} TFLOP/s algorithmic "
              f"({100 * fl / best / 197e12:.1f}% of v5e bf16 peak), "
              f"{by / best / 1e9:.0f} GB/s op-bytes "
              f"({100 * by / best / 819e9:.0f}% of HBM spec)", file=sys.stderr)
    except Exception as e:
        print(f"roofline diagnostic skipped: {e}", file=sys.stderr)

    # secondary metrics (stderr only)
    try:
        inv = jnp.asarray(
            inverse_mel_weights(cfg.n_bins, cfg.num_mels, cfg.mel_fmin,
                                cfg.mel_fmax), jnp.float32)
        logmels = [step(x) for x in xbs]
        keys = jax.random.split(jax.random.PRNGKey(0), batch)
        gl = jax.jit(jax.vmap(
            lambda s, k: mel_decode(s, cfg.resolut, cfg.window, inv,
                                    cfg.griffin_lim_iterations, k,
                                    1.0, 0.0, None)))
        t = pipelined_time(gl, [(m, keys) for m in logmels], n_lo=5, n_hi=25)
        print(f"griffin-lim({cfg.griffin_lim_iterations}) decode: "
              f"{audio_s / t:.0f} audio-s/s", file=sys.stderr)

        pc = PhaseConfig.cli_default()
        pwin = jnp.asarray(hann_window(pc.resolut), jnp.float32)
        pe = jax.jit(jax.vmap(lambda x: phase_encode(
            x, pc.num_freqs, pc.resolut, pc.window, pwin)))
        pd = jax.jit(jax.vmap(lambda s: phase_decode(
            s, pc.resolut, pc.window, 0.0, None)))
        specs = [pe(x) for x in xbs]
        te = pipelined_time(pe, [(x,) for x in xbs], n_lo=8, n_hi=40)
        td = pipelined_time(pd, [(s,) for s in specs], n_lo=8, n_hi=40)
        # round trip = ONE fused encode->decode program (adopted r5:
        # +12% over the two-dispatch sequence, bit-identical —
        # benchmarks/exp_fused_roundtrip.py; serving.export_phase_roundtrip)
        prt = jax.jit(jax.vmap(lambda x: phase_decode(
            phase_encode(x, pc.num_freqs, pc.resolut, pc.window, pwin),
            pc.resolut, pc.window, 0.0, None)))
        trt = pipelined_time(prt, [(x,) for x in xbs], n_lo=8, n_hi=40)
        print(f"phase encode: {audio_s / te:.0f} a-s/s, decode: "
              f"{audio_s / td:.0f} a-s/s, roundtrip (fused): "
              f"{audio_s / trt:.0f} a-s/s "
              f"(two-dispatch {audio_s / (te + td):.0f})", file=sys.stderr)

        # sample-rate family sweep (VERDICT r3 item 3): the reference's
        # 44.1k family uses 836 bins — an odd, non-128-aligned count —
        # and HDR doubles bins (836*2=1672, 768*2=1536;
        # /root/reference/phase.py:49-61, phase.py:41). Shows the headline
        # generalizes beyond the 48k/1536 flagship tiling.
        for fam_sr, nf_base in ((48000, 768), (44100, 836)):
            for hdr in (False, True):
                nf = nf_base * 2 if hdr else nf_base
                if nf == pc.num_freqs and fam_sr == sr:
                    continue  # the flagship row above already measured this
                n_fam = pad_length(int(fam_sr * secs), pc.window)
                a_s = batch * n_fam / fam_sr
                xf = [jax.device_put(jnp.asarray(
                    rng.standard_normal((batch, n_fam)), jnp.float32), dev)
                    for _ in range(2)]
                pe_f = jax.jit(jax.vmap(lambda x, _nf=nf: phase_encode(
                    x, _nf, pc.resolut, pc.window, pwin)))
                pd_f = jax.jit(jax.vmap(lambda s: phase_decode(
                    s, pc.resolut, pc.window, 0.0, None)))
                specs_f = [pe_f(x) for x in xf]
                te_f = pipelined_time(pe_f, [(x,) for x in xf], 8, 40)
                td_f = pipelined_time(pd_f, [(s,) for s in specs_f], 8, 40)
                tag = f"sr={fam_sr} nf={nf}" + (" HDR" if hdr else "")
                print(f"phase encode [{tag}]: {a_s / te_f:.0f} a-s/s, "
                      f"decode: {a_s / td_f:.0f} a-s/s", file=sys.stderr)

        # IHS rows: the reference applies 2 asinh passes at PNG quantization
        # (host-side, io/imagecodec.py; IHS implies !HDR so nf=768). These
        # rows measure the DEVICE cost of the same compression fused into
        # the codec, for tensor-path consumers that skip the PNG.
        nf_ihs = 768
        pe_ihs = jax.jit(jax.vmap(lambda x: jnp.arcsinh(jnp.arcsinh(
            phase_encode(x, nf_ihs, pc.resolut, pc.window, pwin)))))
        pd_ihs = jax.jit(jax.vmap(lambda s: phase_decode(
            jnp.sinh(jnp.sinh(s)), pc.resolut, pc.window, 0.0, None)))
        specs_i = [pe_ihs(x) for x in xbs]
        te_i = pipelined_time(pe_ihs, [(x,) for x in xbs], 8, 40)
        td_i = pipelined_time(pd_ihs, [(s,) for s in specs_i], 8, 40)
        print(f"phase encode [IHS(2) on-device, nf=768]: "
              f"{audio_s / te_i:.0f} a-s/s, decode: {audio_s / td_i:.0f} "
              "a-s/s", file=sys.stderr)

        # mel encode at the 44.1k family length (same weights — the mel
        # config has no family variation in the reference; different frame
        # count exercises a different tiling)
        n441 = pad_length(int(44100 * secs), cfg.window)
        x441 = [jax.device_put(jnp.asarray(
            rng.standard_normal((batch, n441)), jnp.float32), dev)
            for _ in range(2)]
        t441 = pipelined_time(step, [(x,) for x in x441], 20, 120)
        print(f"mel encode [sr=44100]: "
              f"{batch * n441 / 44100 / t441:.0f} audio-s/s", file=sys.stderr)

        # shard_map tax on real hardware: the long-form frame-sharded encode
        # on a 1x1 mesh runs the IDENTICAL halo-exchange program the pod
        # runs (collectives lower to no-ops at mesh size 1); its throughput
        # vs the plain path measures the scale-out layer's per-chip cost
        from gomel_tpu.core.framing import num_frames
        from gomel_tpu.parallel import sharded as sh
        from gomel_tpu.parallel.mesh import make_mesh
        mesh1 = make_mesh(data=1, frame=1, devices=[dev])
        plan = sh.plan_frame_sharding(
            num_frames(n, cfg.resolut, cfg.window), cfg.resolut, cfg.window, 1)
        enc_sh = sh.sharded_mel_encode_fn(
            mesh1, plan, cfg.num_mels,
            mel_weights(cfg.n_bins, cfg.num_mels, cfg.mel_fmin, cfg.mel_fmax))
        xps = [sh.pad_signal_for_plan(x, plan) for x in xbs]
        ts = pipelined_time(enc_sh, [(x,) for x in xps], n_lo=8, n_hi=40)
        print(f"frame-sharded encode (1x1 mesh): {audio_s / ts:.0f} a-s/s "
              f"(shard_map tax {100 * (ts / best - 1):+.1f}% vs plain)",
              file=sys.stderr)
    except Exception as e:  # secondary metrics must never break the bench
        print(f"secondary metrics skipped: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "mel_extract_throughput",
        "value": round(value, 1),
        "unit": "audio-seconds/s per chip",
        "vs_baseline": round(value / BASELINE_AUDIO_S_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
