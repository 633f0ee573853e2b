import time
import jax, jax.numpy as jnp, numpy as np
import gomel_tpu.ops.mxu_fft as mxu
from gomel_tpu.core.config import MelConfig
from gomel_tpu.core.filterbank import mel_weights, inverse_mel_weights
from gomel_tpu.core.framing import pad_length
from gomel_tpu.ops.mel_ops import mel_encode, mel_decode
from gomel_tpu.ops.stft import hann_window

cfg = MelConfig.cli_default()
fwd = jnp.asarray(mel_weights(cfg.n_bins, cfg.num_mels, cfg.mel_fmin, cfg.mel_fmax), jnp.float32)
inv = jnp.asarray(inverse_mel_weights(cfg.n_bins, cfg.num_mels, cfg.mel_fmin, cfg.mel_fmax), jnp.float32)
win = jnp.asarray(hann_window(cfg.resolut), jnp.float32)
rng = np.random.default_rng(0)
n = pad_length(int(48000*30), cfg.window)
xb = jnp.asarray(rng.standard_normal((8, n)), jnp.float32)
audio_s = 8*n/48000
enc = jax.jit(jax.vmap(lambda x: mel_encode(x, cfg.num_mels, cfg.resolut, cfg.window, fwd, win)))
logmel = enc(xb); jax.block_until_ready(logmel)
keys = jax.random.split(jax.random.PRNGKey(0), 8)

def bench(tag, prec):
    mxu.PREC = prec
    gl = jax.jit(jax.vmap(lambda s, k: mel_decode(s, cfg.resolut, cfg.window, inv, 2, k, 1.0, 0.0, win)))
    out = gl(logmel, keys)
    cs = float(jnp.sum(jnp.abs(out)))
    # quality: mel spectral convergence of reconstruction
    rec_mel = enc(out[:, :n])
    rel = float(jnp.linalg.norm(rec_mel - logmel) / jnp.linalg.norm(logmel))
    best=1e9
    for _ in range(3):
        t0=time.perf_counter()
        for _ in range(4): out = gl(logmel, keys)
        jax.block_until_ready(out)
        best=min(best,(time.perf_counter()-t0)/4)
    print(f"{tag}: {best*1e3:.1f}ms ({audio_s/best:.0f} a-s/s) checksum={cs:.0f} mel-rel-L2={rel:.4f}")

bench("HIGHEST", jax.lax.Precision.HIGHEST)
bench("DEFAULT", jax.lax.Precision.DEFAULT)
mxu.PREC = jax.lax.Precision.HIGHEST
