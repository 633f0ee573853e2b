import time
import jax, jax.numpy as jnp, numpy as np
from gomel_tpu.ops import mxu_fft as m

rng = np.random.default_rng(0)
F, N = 8976, 4096
frames = jnp.asarray(rng.standard_normal((F, N)), jnp.float32)
frames2 = jnp.asarray(rng.standard_normal((F, N)), jnp.float32)
h = np.fft.rfft(np.asarray(frames), axis=-1)
re = jnp.asarray(h.real, jnp.float32); im = jnp.asarray(h.imag, jnp.float32)
re2 = jnp.flip(re, 0); im2 = jnp.flip(im, 0)

def timeit(f, pairs, iters=8):
    for a in pairs: jax.block_until_ready(f(*a))
    best=1e9
    for _ in range(3):
        t0=time.perf_counter(); cnt=0
        for _ in range(iters):
            for a in pairs: r=f(*a); cnt+=1
        jax.block_until_ready(r)
        best=min(best,(time.perf_counter()-t0)/cnt)
    return best

mag_direct = jax.jit(lambda f: m.rfft_mag(f, N))
mag_packed = jax.jit(lambda f: (lambda t: jnp.sqrt(t[0]**2 + t[1]**2))(m.rfft_packed(f, N)))
inv_direct = jax.jit(lambda r, i: m.irfft(r, i, N))
inv_packed = jax.jit(lambda r, i: m.irfft_packed(r, i, N))
# verify on device
d1 = float(jnp.max(jnp.abs(mag_packed(frames) - mag_direct(frames))))
d2 = float(jnp.max(jnp.abs(inv_packed(re, im) - inv_direct(re, im))))
print("device agreement: mag", d1, "inv", d2)
t_md = timeit(mag_direct, [(frames,), (frames2,)])
t_mp = timeit(mag_packed, [(frames,), (frames2,)])
t_id = timeit(inv_direct, [(re, im), (re2, im2)])
t_ip = timeit(inv_packed, [(re, im), (re2, im2)])
print(f"fwd mag: direct {t_md*1e3:.2f}ms  packed {t_mp*1e3:.2f}ms")
print(f"inverse: direct {t_id*1e3:.2f}ms  packed {t_ip*1e3:.2f}ms")
