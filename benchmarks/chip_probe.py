"""Raw chip characterization through the axon tunnel: dispatch latency,
achieved HBM bandwidth, and MXU matmul throughput. Run: python benchmarks/chip_probe.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def best_of(fn, args, iters=20, trials=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    # 1. dispatch latency: tiny elementwise op
    tiny = jnp.ones((8, 128), jnp.float32)
    f_tiny = jax.jit(lambda x: x + 1.0)
    t = best_of(f_tiny, (tiny,), iters=50)
    print(f"tiny op latency: {t:.3f} ms")

    # 2. pure bandwidth: copy-scale of 147 MB (the GL frames tensor size)
    big = jnp.ones((8, 1122, 4096), jnp.float32)  # 147 MB
    f_scale = jax.jit(lambda x: x * 2.0)
    t = best_of(f_scale, (big,), iters=10)
    gb = 2 * big.size * 4 / 1e9
    print(f"scale 147MB: {t:.3f} ms -> {gb / (t * 1e-3):.0f} GB/s")

    # 2b. add of two big arrays (3x traffic)
    f_add = jax.jit(lambda x, y: x + y)
    t = best_of(f_add, (big, big), iters=10)
    gb = 3 * big.size * 4 / 1e9
    print(f"add 147MB+147MB: {t:.3f} ms -> {gb / (t * 1e-3):.0f} GB/s")

    # 3. MXU throughput: [8960, 4096] @ [4096, 4096] f32 DEFAULT
    a = jnp.ones((8960, 4096), jnp.float32)
    b = jnp.ones((4096, 4096), jnp.float32)
    f_mm = jax.jit(lambda x, y: x @ y)
    t = best_of(f_mm, (a, b), iters=5)
    fl = 2 * 8960 * 4096 * 4096 / 1e12
    print(f"matmul DEFAULT: {t:.3f} ms -> {fl / (t * 1e-3):.1f} TFLOP/s")

    f_mm_hi = jax.jit(lambda x, y: jnp.matmul(x, y,
                      precision=jax.lax.Precision.HIGHEST))
    t = best_of(f_mm_hi, (a, b), iters=5)
    print(f"matmul HIGHEST: {t:.3f} ms -> {fl / (t * 1e-3):.1f} TFLOP/s")

    # 4. batched small matmul as in MXU FFT stage: [8,1122,64,64]@[64,64]
    xs = jnp.ones((8, 1122, 64, 64), jnp.float32)
    w = jnp.ones((64, 64), jnp.float32)
    f_bmm = jax.jit(lambda x, y: jnp.matmul(x, y))
    t = best_of(f_bmm, (xs, w), iters=10)
    fl = 2 * 8 * 1122 * 64 * 64 * 64 / 1e12
    gb = 2 * xs.size * 4 / 1e9
    print(f"batched 64x64 matmul: {t:.3f} ms -> {fl/(t*1e-3):.2f} TFLOP/s, "
          f"{gb/(t*1e-3):.0f} GB/s streamed")

    # 5. reshape/transpose cost as in mxu_fft stage 1: swapaxes
    f_tr = jax.jit(lambda x: x.reshape(8, 1122, 64, 64).swapaxes(-1, -2)
                   .reshape(8, 1122, 4096) * 1.0)
    t = best_of(f_tr, (big,), iters=10)
    gb = 2 * big.size * 4 / 1e9
    print(f"64x64 transpose 147MB: {t:.3f} ms -> {gb/(t*1e-3):.0f} GB/s")

    # 6. jnp.fft.rfft for comparison (XLA native FFT)
    frames = jnp.ones((8, 1122, 4096), jnp.float32)
    f_fft = jax.jit(lambda x: jnp.abs(jnp.fft.rfft(x, axis=-1)))
    t = best_of(f_fft, (frames,), iters=5)
    print(f"XLA rfft 4096 x 8976 frames: {t:.3f} ms")


if __name__ == "__main__":
    main()
