"""CT-FFT factor-split sweep: N = 4096 as 64x64 (shipped) vs 32x128 / 128x32.

ops/mxu_fft._split picks the most-square N1*N2 decomposition (64x64 at the
flagship N=4096). The MXU systolic array is 128x128, so a 64-wide
contraction may waste tile capacity; the rectangular splits trade stage-1
contraction width (n2) against stage-3 width (n1) and twiddle/layout work.
Interleaved race of the full batch-2 mel encode per split.

Run on the chip:  timeout 580 python benchmarks/exp_ct_split.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import pipelined_time


def main():
    from gomel_tpu.core.config import MelConfig
    from gomel_tpu.core.filterbank import mel_weights
    from gomel_tpu.core.framing import pad_length
    from gomel_tpu.ops import mxu_fft
    from gomel_tpu.ops.mel_ops import mel_encode_batch
    from gomel_tpu.ops.stft import hann_window

    cfg = MelConfig.cli_default()
    n = pad_length(48000 * 30, cfg.window)
    audio_s = 2 * n / 48000
    dev = jax.devices()[0]
    fwd = jnp.asarray(mel_weights(cfg.n_bins, cfg.num_mels, cfg.mel_fmin,
                                  cfg.mel_fmax), jnp.float32)
    win = jnp.asarray(hann_window(cfg.resolut), jnp.float32)
    rng = np.random.default_rng(0)
    xbs = [jax.device_put(jnp.asarray(
        rng.standard_normal((2, n)), jnp.float32), dev) for _ in range(2)]

    orig_split = mxu_fft._split
    fns = {}
    ref = None
    for n1, n2 in ((64, 64), (32, 128), (128, 32)):
        mxu_fft._split = lambda n_, a=n1, b=n2: (a, b) if n_ == 4096 \
            else orig_split(n_)
        mxu_fft._fwd_consts_np.cache_clear()
        mxu_fft._inv_consts_np.cache_clear()
        f = jax.jit(lambda xb, _a=n1, _b=n2: mel_encode_batch(
            xb, cfg.num_mels, cfg.resolut, cfg.window, fwd, win))
        out = np.asarray(f(xbs[0]))
        if ref is None:
            ref = out
        else:
            print(f"{n1}x{n2} max|diff| vs 64x64:",
                  float(np.abs(out - ref).max()), flush=True)
        fns[f"{n1}x{n2}"] = f
    mxu_fft._split = orig_split

    res = {k: [] for k in fns}
    for r in range(4):
        for name, f in fns.items():
            t = pipelined_time(f, [(x,) for x in xbs], n_lo=8, n_hi=40,
                               trials=1)
            res[name].append(audio_s / t)
            print(f"round {r} {name:8s}: {audio_s / t:8.0f} a-s/s",
                  flush=True)
    print()
    for name, v in res.items():
        print(f"{name:8s}: best {max(v):8.0f}  median "
              f"{sorted(v)[len(v) // 2]:8.0f}  all {[int(x) for x in v]}")


if __name__ == "__main__":
    main()
