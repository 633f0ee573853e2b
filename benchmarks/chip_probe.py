"""Raw chip characterization through the axon tunnel: read-back RTT,
achieved HBM bandwidth, and MXU matmul throughput.

Methodology note (CLAUDE.md): this runtime DEFERS execution until a value
read-back, and memoizes identical (executable, input) repeats —
block_until_ready loops measure nothing. Every number below therefore uses
the pipelined-slope method: N calls over alternating inputs, a jitted
scalar read of the final output, per-call = slope between a small-N and a
large-N run (the constant ~27 ms read-back RTT cancels).

Reference numbers measured 2026-08-17 (TPU v5 lite): scale 147 MB ->
~860 GB/s (~HBM spec), matmul DEFAULT ~200 TFLOP/s-class.
Run from repo root: python benchmarks/chip_probe.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

_chk = jax.jit(lambda y: jnp.sum(y))


def read(out):
    return float(_chk(out))


def slope(fn, argsets, n_lo=4, n_hi=24, trials=3):
    for a in argsets:
        assert np.isfinite(read(fn(*a)))

    def run(n):
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(*argsets[i % len(argsets)])
        read(out)
        return time.perf_counter() - t0

    t_lo = min(run(n_lo) for _ in range(trials))
    t_hi = min(run(n_hi) for _ in range(trials))
    return (t_hi - t_lo) / (n_hi - n_lo)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)

    # read-back round trip (the constant the slope method cancels)
    f_sum = jax.jit(jnp.sum)
    x = mk(8, 128)
    float(f_sum(x))
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        float(f_sum(mk(8, 128)))
        ts.append(time.perf_counter() - t0)
    print(f"read-back RTT: {min(ts)*1e3:.1f} ms")

    # HBM bandwidth: scale of a 147 MB tensor (read + write)
    bigs = [(mk(8, 1122, 4096),), (mk(8, 1122, 4096),)]
    f_scale = jax.jit(lambda v: v * 2.0)
    per = slope(f_scale, bigs, n_lo=4, n_hi=28)
    gb = 2 * bigs[0][0].size * 4 / 1e9
    print(f"scale 147MB: {per*1e3:.3f} ms -> {gb/per:.0f} GB/s")

    # MXU: [8960, 4096] @ [4096, 4096]
    a0, a1, b = mk(8960, 4096), mk(8960, 4096), mk(4096, 4096)
    fl = 2 * 8960 * 4096 * 4096 / 1e12
    for name, prec in (("DEFAULT", jax.lax.Precision.DEFAULT),
                       ("HIGH", jax.lax.Precision.HIGH),
                       ("HIGHEST", jax.lax.Precision.HIGHEST)):
        f_mm = jax.jit(lambda u, v, p=prec: jnp.matmul(u, v, precision=p))
        per = slope(f_mm, [(a0, b), (a1, b)], n_lo=3, n_hi=15)
        print(f"matmul {name:7s}: {per*1e3:.3f} ms -> {fl/per:.0f} TFLOP/s")

    # XLA's native FFT for comparison (vector-unit bound)
    f_fft = jax.jit(lambda v: jnp.abs(jnp.fft.rfft(v, axis=-1)))
    per = slope(f_fft, bigs, n_lo=3, n_hi=11)
    print(f"XLA rfft 4096 x 8976 frames: {per*1e3:.3f} ms")


if __name__ == "__main__":
    main()
