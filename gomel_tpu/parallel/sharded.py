"""Frame-sharded STFT / overlap-add / Griffin-Lim — the halo-exchange layer.

The reference processes whole files on one CPU core; frames are independent in
analysis and couple only ±1 analysis-window length in synthesis
(/root/reference/phase/phase.go:102-112, mel/mel.go:111-125). That locality is
exactly what makes long-form audio frame-shardable across chips (SURVEY.md
§2.6, §5): each device owns a contiguous run of STFT frames, and the only
communication is a one-frame-length halo at shard boundaries:

- analysis (STFT): device d needs the first ``frame_len - hop`` samples of
  device d+1's signal chunk  → one ``ppermute`` toward the LEFT neighbor.
- synthesis (overlap-add): device d's last frames spill ``frame_len - hop``
  output samples into device d+1's span → one ``ppermute`` toward the RIGHT
  neighbor, added into the head.
- the iSTFT window-sum stability threshold is GLOBAL (0.5 * max over the whole
  signal, phase/phase.go:117) → one ``pmax`` over the frame axis.

Everything runs under ``shard_map`` on a ``('data','frame')`` mesh: utterance
batch over 'data', frames over 'frame'. Griffin-Lim keeps its signal carry
shard-resident in HBM across ``fori_loop`` iterations; each iteration does the
two halo exchanges and nothing else over ICI.

Sharding plan (host-side math): with F real frames, K = ceil(frame_len/hop),
the frame axis is padded to F_pad — a multiple of n_shards with
F_pad >= F + K - 1 and per-shard frame count F_loc >= K - 1 — so that (a) all
real signal lives inside the F_pad*hop-sample sharded buffer, (b) halos never
span more than one neighbor. Fake frames are masked out of window sums and
carry zero magnitude, so they contribute nothing.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.stft import auto_frame_chunk, frame_signal, hann_window
from ..ops.fftbackend import irfft_planes, rfft_planes
from ..ops.istft import (chunked_irfft_overlap_add, normalize_by_window_sum,
                         overlap_add)
from ..ops.griffinlim import griffin_lim_magnitudes
from ..ops.mel_ops import _mel_from_mags, mel_encode, mel_to_linear
from ..ops.phase_ops import grow_half_planes, phase_encode
from .mesh import DATA_AXIS, FRAME_AXIS


# ---------------------------------------------------------------------------
# Host-side sharding plan
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class FrameShardPlan:
    """Static geometry of a frame-sharded run."""
    frame_len: int
    hop: int
    n_shards: int
    n_frames: int        # real frames F
    n_frames_padded: int # F_pad (multiple of n_shards)
    out_len: int         # real output length frame_len + (F-1)*hop

    @property
    def halo(self) -> int:
        return self.frame_len - self.hop

    @property
    def frames_per_shard(self) -> int:
        return self.n_frames_padded // self.n_shards

    @property
    def chunk(self) -> int:
        """Signal samples owned per shard."""
        return self.frames_per_shard * self.hop

    @property
    def sharded_signal_len(self) -> int:
        return self.n_frames_padded * self.hop


def plan_frame_sharding(n_frames: int, frame_len: int, hop: int,
                        n_shards: int) -> FrameShardPlan:
    """Compute the padded frame count for an even, halo-local sharding."""
    if n_frames <= 0:
        raise ValueError("need at least one frame")
    k = -(-frame_len // hop)  # ceil
    min_frames = max(n_frames + k - 1, n_shards * (k - 1), n_shards)
    f_pad = -(-min_frames // n_shards) * n_shards
    return FrameShardPlan(
        frame_len=frame_len, hop=hop, n_shards=n_shards,
        n_frames=n_frames, n_frames_padded=f_pad,
        out_len=frame_len + (n_frames - 1) * hop,
    )


def pad_signal_for_plan(x, plan: FrameShardPlan):
    """Zero-pad (or tail-truncate) a [..., L] signal to the sharded buffer.

    Samples past ``(n_frames-1)*hop + frame_len`` are read by no frame — the
    reference's pad-to-multiple-minus-one scheme (mel/impl.go:437-446) leaves
    up to hop-1 such samples — so truncating to the buffer is lossless;
    anything beyond that is an inconsistent plan. Type-preserving: numpy in,
    numpy out (multi-process callers must keep prep host-side).
    """
    L = x.shape[-1]
    target = plan.sharded_signal_len
    if L > target:
        if L > target + plan.hop - 1 or L > plan.out_len + plan.hop - 1:
            raise ValueError(
                f"signal length {L} inconsistent with plan (buffer {target})")
        return x[..., :target]
    pad = [(0, 0)] * (x.ndim - 1) + [(0, target - L)]
    xp = np if isinstance(x, np.ndarray) else jnp
    return xp.pad(x, pad)


def pad_frames_for_plan(spec, plan: FrameShardPlan, axis: int = 1):
    """Zero-pad the frame axis of a spectrogram to n_frames_padded
    (type-preserving, like pad_signal_for_plan)."""
    f = spec.shape[axis]
    pad = [(0, 0)] * spec.ndim
    pad[axis] = (0, plan.n_frames_padded - f)
    xp = np if isinstance(spec, np.ndarray) else jnp
    return xp.pad(spec, pad)


# ---------------------------------------------------------------------------
# Halo-exchange primitives (inside shard_map, axis=FRAME_AXIS)
# ---------------------------------------------------------------------------

def _pull_right_halo(x_loc: jax.Array, halo: int, n: int,
                     axis_name: str) -> jax.Array:
    """Fetch the first ``halo`` samples (last axis) of the RIGHT neighbor's
    chunk; the last shard receives zeros (open boundary)."""
    head = x_loc[..., :halo]
    if n == 1:
        return jnp.zeros_like(head)
    return jax.lax.ppermute(head, axis_name,
                            [(i, i - 1) for i in range(1, n)])


def _push_tail_right(tail: jax.Array, n: int, axis_name: str) -> jax.Array:
    """Send the overlap-add tail to the RIGHT neighbor; shard 0 receives
    zeros (open boundary)."""
    if n == 1:
        return jnp.zeros_like(tail)
    return jax.lax.ppermute(tail, axis_name,
                            [(i, i + 1) for i in range(n - 1)])


def _local_frame_mask(f_loc: int, n_frames: int, axis_name: str) -> jax.Array:
    """[f_loc] bool mask: which local frames are real (global index < F)."""
    shard = jax.lax.axis_index(axis_name)
    gidx = shard * f_loc + jnp.arange(f_loc)
    return gidx < n_frames


# ---------------------------------------------------------------------------
# Shard-local kernels (operate on one device's [B_loc, ...] block)
# ---------------------------------------------------------------------------

def _local_signal_ext(x_loc, plan: FrameShardPlan):
    """[B, chunk] local signal -> [B, chunk + halo] with the right
    neighbor's head pulled in — the extended signal every analysis path
    frames from (single definition of the halo protocol)."""
    halo = _pull_right_halo(x_loc, plan.halo, plan.n_shards, FRAME_AXIS)
    return jnp.concatenate([x_loc, halo], axis=-1)


def _local_frames(x_loc, window, plan: FrameShardPlan):
    """[B, chunk] local signal -> [B, F_loc, N] windowed frames (halo pull)."""
    frames = jax.vmap(
        lambda s: frame_signal(s, plan.frame_len, plan.hop))(
        _local_signal_ext(x_loc, plan))
    return frames * window


def _local_frames_raw(x_loc, plan: FrameShardPlan):
    """[B, chunk] -> [B, F_loc, N] UNwindowed frames (window folded into the
    mm DFT weights by the caller)."""
    return jax.vmap(lambda s: frame_signal(s, plan.frame_len, plan.hop))(
        _local_signal_ext(x_loc, plan))


def _local_stft_planes(x_loc, window, plan: FrameShardPlan,
                       fft_backend: str = "auto", precision=None):
    """[B, chunk] -> (re, im) local rfft frame planes [B, F_loc, N/2+1]."""
    return rfft_planes(_local_frames(x_loc, window, plan), plan.frame_len,
                       fft_backend, precision)


def _use_mm(n: int) -> bool:
    """True when the decode-side direct-DFT-matmul backend applies
    (same dispatch as ops/istft.py and ops/griffinlim.py)."""
    from ..ops.fftbackend import resolve
    return resolve("auto_lowp", n) == "mm"


def _local_irfft_windowed(re, im, window_np, plan: FrameShardPlan, dtype):
    """irfft(re, im) * window for the decode side: XLA's native irfft —
    exact f32 and the fastest inverse at serving shapes (same measured
    policy as ops/istft.py; benchmarks/RESULTS.md)."""
    frames = irfft_planes(re, im, plan.frame_len, "xla").astype(dtype)
    return frames * jnp.asarray(window_np, dtype)


def _local_irfft_windowed_lowp(re, im, window_np, plan: FrameShardPlan,
                               dtype, use_mm: bool | None = None):
    """Interior-Griffin-Lim inverse: mm backend at DEFAULT with the window
    folded into the weights (bandwidth-minimal; error never reaches the
    output — the final iteration uses the exact path above). ``use_mm=None``
    resolves "auto_lowp" at trace time; export callers pin it."""
    from ..ops import dft_mm

    if _use_mm(plan.frame_len) if use_mm is None else use_mm:
        return dft_mm.irfft_windowed(re, im, plan.frame_len, window_np,
                                     jax.lax.Precision.DEFAULT).astype(dtype)
    return _local_irfft_windowed(re, im, window_np, plan, dtype)


def _local_stft(x_loc, window, plan: FrameShardPlan):
    """[B, chunk] local signal -> [B, F_loc, N/2+1] local rfft frames."""
    re, im = _local_stft_planes(x_loc, window, plan, "xla")
    return jax.lax.complex(re, im)


def _local_overlap_add(frames_windowed, plan: FrameShardPlan):
    """[B, F_loc, N] windowed frames -> [B, chunk] with right-halo exchange."""
    sig_ext = jax.vmap(lambda f: overlap_add(f, plan.hop))(frames_windowed)
    body, tail = sig_ext[..., : plan.chunk], sig_ext[..., plan.chunk:]
    recv = _push_tail_right(tail, plan.n_shards, FRAME_AXIS)
    return body.at[..., : plan.halo].add(recv)


def _local_window_sum(window, mask, plan: FrameShardPlan):
    """[chunk] window-square sum over REAL local frames, halo-exchanged."""
    w2 = jnp.where(mask[:, None], (window * window)[None, :], 0.0)
    sig_ext = overlap_add(w2, plan.hop)
    body, tail = sig_ext[: plan.chunk], sig_ext[plan.chunk:]
    recv = _push_tail_right(tail, plan.n_shards, FRAME_AXIS)
    return body.at[: plan.halo].add(recv)


# ---------------------------------------------------------------------------
# Sharded pipelines (shard_map entry points)
# ---------------------------------------------------------------------------

def _specs(mesh: Mesh):
    sig = P(DATA_AXIS, FRAME_AXIS)          # [B, L] signal
    spec = P(DATA_AXIS, FRAME_AXIS, None)   # [B, F, bins(, ch)]
    return sig, spec


def sharded_stft_fn(mesh: Mesh, plan: FrameShardPlan, dtype=jnp.float32,
                    fft_backend: str = "auto"):
    """Build a jitted [B, F_pad*hop] -> (re, im) sharded STFT, each plane
    [B, F_pad, N/2+1].

    Real/imag planes, not complex64 — complex arrays cannot leave the device
    on the axon transport (CLAUDE.md) and the sibling kernels are all
    plane-based. ``fft_backend="auto"`` resolves against the TRACE-time
    default backend (ops/fftbackend.py) — jax.export callers must pass an
    explicit backend (serving.py does)."""
    window = jnp.asarray(hann_window(plan.frame_len), dtype=dtype)
    sig_spec, spec_spec = _specs(mesh)

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(sig_spec,),
        out_specs=(P(DATA_AXIS, FRAME_AXIS, None),) * 2)
    def _fn(x):
        return _local_stft_planes(x, window, plan, fft_backend)

    return jax.jit(_fn)


def sharded_istft_fn(mesh: Mesh, plan: FrameShardPlan, dtype=jnp.float32):
    """Build a jitted sharded direct iSTFT with GLOBAL window-sum threshold:
    [B, F_pad, N/2+1] complex -> [B, F_pad*hop] real.

    Parity target: /root/reference/phase/phase.go:93-133 (the 0.5*max
    stability threshold is a global pmax across shards)."""
    window = jnp.asarray(hann_window(plan.frame_len), dtype=dtype)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(DATA_AXIS, FRAME_AXIS, None),),
        out_specs=P(DATA_AXIS, FRAME_AXIS))
    def _fn(half_spec):
        mask = _local_frame_mask(plan.frames_per_shard, plan.n_frames,
                                 FRAME_AXIS)
        # exact XLA inverse (same policy + measured numbers as
        # ops/istft.py); masking whole frames commutes with the windowing
        frames_w = _local_irfft_windowed(
            jnp.real(half_spec), jnp.imag(half_spec),
            hann_window(plan.frame_len), plan, window.dtype)
        frames_w = jnp.where(mask[None, :, None], frames_w, 0.0)
        sig = _local_overlap_add(frames_w, plan)
        wsum = _local_window_sum(window, mask, plan)
        local_max = jnp.max(wsum)
        global_max = jax.lax.pmax(local_max, FRAME_AXIS)
        return normalize_by_window_sum(sig, wsum[None, :], 0.5 * global_max)

    return jax.jit(_fn)


def _shard_noise(key, plan: FrameShardPlan, b_loc: int, dtype):
    """Per-shard uniform Griffin-Lim init (inside shard_map): fold both mesh
    axis indices into the key. SINGLE definition shared by the fused
    noise_init path and the standalone generator — decode_resumable's
    bit-equality with decode depends on them never drifting."""
    shard_id = (jax.lax.axis_index(DATA_AXIS) * plan.n_shards
                + jax.lax.axis_index(FRAME_AXIS))
    return jax.random.uniform(jax.random.fold_in(key, shard_id),
                              (b_loc, plan.chunk), dtype=dtype)


def sharded_gl_noise_fn(mesh: Mesh, plan: FrameShardPlan, batch: int,
                        dtype=jnp.float32):
    """key -> [batch, F_pad*hop] per-shard uniform Griffin-Lim init, drawn
    inside shard_map with the SAME fold_in scheme as
    ``sharded_griffin_lim_fn(noise_init=True)`` — so a segmented/resumable
    run starting from this noise reproduces the one-call run bit-for-bit."""
    n_data = mesh.shape[DATA_AXIS]
    if batch % n_data != 0:
        raise ValueError(f"batch {batch} must be a multiple of the data "
                         f"axis ({n_data})")
    b_loc = batch // n_data

    @functools.partial(shard_map, mesh=mesh, in_specs=(P(),),
                       out_specs=P(DATA_AXIS, FRAME_AXIS))
    def _fn(key):
        return _shard_noise(key, plan, b_loc, dtype)

    return jax.jit(_fn)


def sharded_griffin_lim_fn(mesh: Mesh, plan: FrameShardPlan, n_iter: int,
                           dtype=jnp.float32, momentum: float = 0.0,
                           noise_init: bool = False,
                           final_iteration: bool = True,
                           interior_mm: bool | None = None):
    """Build a jitted sharded Griffin-Lim:
    (mag [B, F_pad, N/2+1], sig0 [B, F_pad*hop]) -> [B, F_pad*hop].

    The signal carry stays shard-resident in HBM across the ``fori_loop``;
    per iteration: left-halo pull (analysis) + right-halo push (synthesis).
    Un-normalized overlap-add, matching /root/reference/mel/mel.go:111-135.

    ``momentum`` > 0 enables the fast-Griffin-Lim extrapolation (see
    ops/griffinlim.py) — it is a pointwise axpy on the shard-local signal
    carry, so it adds NO collectives and no halo traffic; ~2-4x fewer
    iterations for equal convergence makes it the preferred way to run the
    long-form GL-64 class of workloads (RESULTS.md "GL momentum").

    ``noise_init=True`` replaces the second input with a (replicated) PRNG
    key: each shard draws its own ``[B_loc, chunk]`` uniform init inside the
    shard_map body (``fold_in`` of both mesh axis indices), so no
    full-signal ``[B, F_pad*hop]`` staging tensor is ever materialized
    outside the mesh — at hour-scale signal lengths that tensor is GB-class
    and is also the host-global-array pattern that breaks multi-process
    meshes. Any uniform init is parity-valid: the reference seeds from
    unseeded ``math/rand`` noise (mel/mel.go:81-83).

    ``final_iteration=False`` runs ALL ``n_iter`` iterations on the interior
    (reduced-precision) path and skips the exact-XLA final inverse — the
    building block for segmented/resumable runs
    (pipelines.longform.LongFormMel.decode_resumable): only the run's very
    last segment sets it True, so the concatenation of segments executes the
    identical iteration sequence as one n_total call.

    ``interior_mm`` pins the interior transform backend: True = direct-DFT
    matmuls (the measured TPU optimum, platform-portable), False = XLA FFT,
    None (default) = resolve "auto_lowp" against the TRACE-time backend.
    jax.export callers must pass an explicit value (serving.py passes True).
    """
    window = jnp.asarray(hann_window(plan.frame_len), dtype=dtype)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(DATA_AXIS, FRAME_AXIS, None),
                  P() if noise_init else P(DATA_AXIS, FRAME_AXIS)),
        out_specs=P(DATA_AXIS, FRAME_AXIS))
    def _fn(mag_loc, sig0):
        if noise_init:
            sig0 = _shard_noise(sig0, plan, mag_loc.shape[0], dtype)
        mask = _local_frame_mask(plan.frames_per_shard, plan.n_frames,
                                 FRAME_AXIS)
        mag = jnp.where(mask[None, :, None], mag_loc, 0.0)

        # policy matches ops/griffinlim.py (measured there): forward
        # mm-DEFAULT (phases of replaced magnitudes), interior inverses
        # mm-DEFAULT, FINAL inverse exact XLA (only the last inverse
        # reaches the output)
        low = jax.lax.Precision.DEFAULT
        wnp = hann_window(plan.frame_len)
        use_mm = _use_mm(plan.frame_len) if interior_mm is None else interior_mm
        from ..ops import dft_mm

        def body(sig, final):
            if use_mm:
                re, im = dft_mm.rfft_windowed(
                    _local_frames_raw(sig, plan), plan.frame_len, wnp, low)
            else:
                re, im = _local_stft_planes(sig, window, plan, precision=low)
            a = jnp.sqrt(re * re + im * im)
            inv = jnp.where(a > 0, 1.0 / jnp.where(a > 0, a, 1.0), 0.0)
            unit_re = jnp.where(a > 0, re * inv, 1.0)
            unit_im = im * inv
            if final:
                rec_w = _local_irfft_windowed(mag * unit_re, mag * unit_im,
                                              wnp, plan, window.dtype)
            else:
                rec_w = _local_irfft_windowed_lowp(
                    mag * unit_re, mag * unit_im, wnp, plan, window.dtype,
                    use_mm)
            return _local_overlap_add(rec_w, plan)

        mom = float(momentum)
        n_interior = n_iter if not final_iteration else max(n_iter - 1, 0)
        if mom != 0.0:
            def accel(_, carry):
                c, t_prev = carry
                t = body(c, False)
                return t + mom * (t - t_prev), t

            sig, _ = jax.lax.fori_loop(0, n_interior, accel, (sig0, sig0))
        else:
            sig = jax.lax.fori_loop(0, n_interior,
                                    lambda _, s: body(s, False), sig0)
        if final_iteration and n_iter >= 1:
            sig = body(sig, True)
        return sig

    return jax.jit(_fn)


# ---------------------------------------------------------------------------
# Codec-level sharded pipelines
# ---------------------------------------------------------------------------

def sharded_phase_encode_fn(mesh: Mesh, plan: FrameShardPlan, num_freqs: int,
                            dtype=jnp.float32, fft_backend: str = "auto",
                            frame_chunk="auto"):
    """[B, F_pad*hop] audio -> [B, F_pad, num_freqs, 2] phase spectrogram
    (parity: /root/reference/phase/phase.go:41-70 — see ops/phase_ops.py).
    jax.export callers must pass an explicit ``fft_backend`` ("auto" is
    resolved at trace time). ``frame_chunk``: lax.map chunking of each
    shard's frames once they outgrow VMEM (ops/stft.py)."""
    window = jnp.asarray(hann_window(plan.frame_len), dtype=dtype)
    fc = (auto_frame_chunk(plan.frames_per_shard)
          if frame_chunk == "auto" else frame_chunk)

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P(DATA_AXIS, FRAME_AXIS),),
        out_specs=P(DATA_AXIS, FRAME_AXIS, None, None))
    def _fn(x):
        if fc:
            x_ext = _local_signal_ext(x, plan)
            return jax.vmap(lambda s: phase_encode(
                s, num_freqs, plan.frame_len, plan.hop, window,
                fft_backend, frame_chunk=fc))(x_ext)
        re, im = _local_stft_planes(x, window, plan, fft_backend)
        return jnp.stack([im[..., 1:num_freqs + 1],
                          re[..., 1:num_freqs + 1]], axis=-1)

    return jax.jit(_fn)


def sharded_phase_decode_fn(mesh: Mesh, plan: FrameShardPlan,
                            volume_boost: float = 0.0, dtype=jnp.float32,
                            frame_chunk="auto"):
    """[B, F_pad, num_freqs, 2] -> [B, F_pad*hop] audio
    (parity: /root/reference/phase/phase.go:136-153). ``frame_chunk``:
    per-chunk synthesis once a shard's frames outgrow VMEM
    (ops/istft.chunked_irfft_overlap_add)."""
    window = jnp.asarray(hann_window(plan.frame_len), dtype=dtype)
    fc = (auto_frame_chunk(plan.frames_per_shard)
          if frame_chunk == "auto" else frame_chunk)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(DATA_AXIS, FRAME_AXIS, None, None),),
        out_specs=P(DATA_AXIS, FRAME_AXIS))
    def _fn(spec2):
        mask = _local_frame_mask(plan.frames_per_shard, plan.n_frames,
                                 FRAME_AXIS)
        re, im = jax.vmap(
            lambda s: grow_half_planes(s, plan.frame_len // 2))(spec2)
        if fc:
            sig_ext = jax.vmap(lambda r, i: chunked_irfft_overlap_add(
                r, i, plan.hop, window, fc, "xla", frame_mask=mask))(re, im)
            body = sig_ext[..., : plan.chunk]
            recv = _push_tail_right(sig_ext[..., plan.chunk:],
                                    plan.n_shards, FRAME_AXIS)
            sig = body.at[..., : plan.halo].add(recv)
        else:
            frames_w = _local_irfft_windowed(
                re, im, hann_window(plan.frame_len), plan, window.dtype)
            frames_w = jnp.where(mask[None, :, None], frames_w, 0.0)
            sig = _local_overlap_add(frames_w, plan)
        wsum = _local_window_sum(window, mask, plan)
        global_max = jax.lax.pmax(jnp.max(wsum), FRAME_AXIS)
        out = normalize_by_window_sum(sig, wsum[None, :], 0.5 * global_max)
        if volume_boost != 0.0:
            out = out * jnp.asarray(volume_boost, out.dtype)
        return out

    return jax.jit(_fn)


def sharded_mel_encode_fn(mesh: Mesh, plan: FrameShardPlan, num_mels: int,
                          fwd_weights: jax.Array, dtype=jnp.float32,
                          fft_backend: str = "auto", frame_chunk="auto"):
    """[B, F_pad*hop] audio -> [B, F_pad, num_mels, 2] log-mel
    (parity: /root/reference/mel/mel.go:46-74). The filterbank matmul is
    replicated per shard — frames are the sharded axis, the weight matrix is
    small and lives on every chip. jax.export callers must pass an explicit
    ``fft_backend`` ("auto" is resolved at trace time). ``frame_chunk``:
    lax.map chunking of each shard's frames once they outgrow VMEM
    (measured ~2x at the 30-minute shape, ops/stft.py)."""
    window = jnp.asarray(hann_window(plan.frame_len), dtype=dtype)
    # Keep the weights a host-side CONSTANT closed over the shard_map body
    # (replicated automatically): threading them as an operand makes
    # _mel_from_mags see a tracer, which both forfeits the measured
    # constant-weights win (RESULTS.md batch-explicit variant C) and blocks
    # the extended-weight single-matmul tail.
    fwd = np.asarray(fwd_weights, dtype=dtype)
    fc = (auto_frame_chunk(plan.frames_per_shard)
          if frame_chunk == "auto" else frame_chunk)

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P(DATA_AXIS, FRAME_AXIS),),
        out_specs=P(DATA_AXIS, FRAME_AXIS, None, None))
    def _fn(x):
        if fc:
            x_ext = _local_signal_ext(x, plan)
            return jax.vmap(lambda s: mel_encode(
                s, num_mels, plan.frame_len, plan.hop, fwd, window,
                fft_backend, frame_chunk=fc))(x_ext)
        re, im = _local_stft_planes(x, window, plan, fft_backend)
        return _mel_from_mags(jnp.sqrt(re * re + im * im), fwd)

    return jax.jit(_fn)


def sharded_mel_decode_fn(mesh: Mesh, plan: FrameShardPlan,
                          inv_weights: jax.Array, n_iter: int,
                          tune_mul: float = 1.0, tune_add: float = 0.0,
                          dtype=jnp.float32, momentum: float = 0.0,
                          interior_mm: bool | None = None):
    """[B, F_pad, num_mels, 2] log-mel + PRNG key -> [B, F_pad*hop] audio via
    sharded Griffin-Lim (parity: /root/reference/mel/mel.go:142-152;
    ``momentum`` > 0 = opt-in fast-GL, ops/griffinlim.py; ``interior_mm``
    pins the interior transform backend for jax.export callers)."""
    inv = jnp.asarray(inv_weights, dtype=dtype)
    gl = sharded_griffin_lim_fn(mesh, plan, n_iter, dtype=dtype,
                                momentum=momentum, noise_init=True,
                                interior_mm=interior_mm)

    @jax.jit
    def _fn(logmel, key):
        # mel->linear is frame-local (no collectives); the GL init noise is
        # drawn per shard INSIDE the shard_map (noise_init) so nothing
        # signal-length is staged outside the mesh.
        lin = jax.vmap(lambda s: mel_to_linear(s, inv, tune_mul, tune_add)
                       )(logmel.astype(dtype))
        mag = jax.vmap(griffin_lim_magnitudes)(lin)
        return gl(mag, key)

    return _fn
