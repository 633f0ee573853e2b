"""Overlap-add iSTFT for TPU.

TPU-native replacement for the reference's per-sample overlap-add loops:
- direct iSTFT with window-sum normalization: /root/reference/phase/phase.go:93-133
  (port: /root/reference/phase.py:184-213)
- un-normalized overlap-add inside Griffin-Lim: /root/reference/mel/mel.go:111-135

Design notes (TPU):
- Overlap-add is computed as K shifted elementwise adds over hop-aligned chunks
  (K = ceil(N/hop), static) — no scatter, no serial loop; XLA fuses the adds.
- The window-sum normalization including the reference's 0.5*max stability
  threshold and proportional edge fade is pure elementwise ``jnp.where``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .fftbackend import irfft_planes


def overlap_add(frames: jax.Array, hop: int) -> jax.Array:
    """Sum overlapping frames: [F, N] -> [N + (F-1)*hop].

    out[i*hop + j] += frames[i, j], vectorized as K shifted adds of hop-chunks.
    """
    F, N = frames.shape
    K = -(-N // hop)  # ceil
    pad_n = K * hop - N
    fp = jnp.pad(frames, ((0, 0), (0, pad_n))).reshape(F, K, hop)
    # out viewed as hop-rows: out_rows[i + k] += fp[i, k]
    # Compute as sum over k of fp[:, k, :] placed at row offset k within
    # a (F + K - 1)-row output: implemented with static pads (pure elementwise).
    rows_out = F + K - 1
    acc = jnp.zeros((rows_out, hop), dtype=frames.dtype)
    for k in range(K):
        acc = acc + jnp.pad(fp[:, k, :], ((k, rows_out - F - k), (0, 0)))
    return acc.reshape(-1)[: N + (F - 1) * hop]


def window_sum(window: jax.Array, n_frames: int, hop: int) -> jax.Array:
    """Overlap-added sum of squared windows (reference: phase/phase.go:109).

    All frames contribute the SAME squared window, so instead of
    overlap-adding n_frames identical rows (O(F*N) traffic), build the result
    from the K = ceil(N/hop) distinct hop-row patterns: with prefix sums S[k]
    of the hop-reshaped w^2 over k, output hop-row i is
    S[min(i, K-1)] - S[i - F] (second term 0 for i < F). O(K*hop) compute,
    one broadcast for the periodic interior.
    """
    w2 = window * window
    N = w2.shape[0]
    K = -(-N // hop)
    F = n_frames
    rows = jnp.pad(w2, (0, K * hop - N)).reshape(K, hop)
    prefix = jnp.cumsum(rows, axis=0)          # S[k] = sum_{j<=k} rows[j]
    full = prefix[-1]
    rows_out = F + K - 1
    if rows_out <= 2 * (K - 1):
        # short signal: direct formula per row
        idx = jnp.arange(rows_out)
        top = prefix[jnp.minimum(idx, K - 1)]
        sub_idx = idx - F
        sub = jnp.where((sub_idx >= 0)[:, None],
                        prefix[jnp.clip(sub_idx, 0, K - 1)], 0.0)
        out = top - sub
    else:
        head = prefix[: K - 1]                                   # rows 0..K-2
        mid = jnp.broadcast_to(full, (rows_out - 2 * (K - 1), hop))
        tail = full - prefix[: K - 1]                            # suffix sums
        out = jnp.concatenate([head, mid, tail], axis=0)
    return out.reshape(-1)[: N + (F - 1) * hop]


def chunked_irfft_overlap_add(re: jax.Array, im: jax.Array, hop: int,
                              window_arr: jax.Array, chunk: int,
                              fft_backend: str = "xla",
                              frame_mask: jax.Array | None = None
                              ) -> jax.Array:
    """Un-normalized windowed overlap-add synthesis, ``lax.scan`` over frame
    chunks: [F, N/2+1] planes -> [N + (F-1)*hop] signal.

    The decode-side analog of ops/stft.map_frame_chunks: at hour-scale frame
    counts the flat path's [F, N] irfft output spills to HBM; per-chunk
    synthesis keeps it VMEM-resident. Chunks couple through the overlap-add
    tail (N - hop samples), carried through the scan — numerically identical
    to the flat kernel up to reduction order. Requires
    ``chunk*hop >= N - hop`` so a tail never spans two chunk bodies.

    ``frame_mask``: optional [F] bool — frames masked False contribute
    nothing (the sharded decode's padded-frame mask).
    """
    F, bins = re.shape
    N = (bins - 1) * 2
    tail_len = N - hop
    if chunk * hop < tail_len:
        raise ValueError(f"chunk {chunk} too small: need chunk*hop >= "
                         f"N - hop = {tail_len}")
    n_chunks = -(-F // chunk)
    pad = n_chunks * chunk - F
    if pad:
        re = jnp.pad(re, ((0, pad), (0, 0)))
        im = jnp.pad(im, ((0, pad), (0, 0)))
    if frame_mask is not None and pad:
        frame_mask = jnp.pad(frame_mask, (0, pad))
    reb = re.reshape(n_chunks, chunk, bins)
    imb = im.reshape(n_chunks, chunk, bins)
    mb = (frame_mask.reshape(n_chunks, chunk) if frame_mask is not None
          else None)
    backend = "xla" if fft_backend == "auto" else fft_backend
    out_dtype = window_arr.dtype

    def step(tail, inputs):
        if mb is None:
            r, i = inputs
        else:
            r, i, m = inputs
        frames_w = irfft_planes(r, i, N, backend).astype(out_dtype) \
            * window_arr
        if mb is not None:
            frames_w = jnp.where(m[:, None], frames_w, 0.0)
        seg = overlap_add(frames_w, hop)  # [chunk*hop + N - hop]
        body = seg[: chunk * hop].at[:tail_len].add(tail)
        return seg[chunk * hop:], body

    # derive the carry from the input (zero-multiplied) so its varying-axes
    # type matches inside shard_map (a fresh zeros literal is unvarying and
    # scan rejects the carry type mismatch)
    init = jnp.zeros((tail_len,), dtype=out_dtype) \
        + (re[0, 0] * 0).astype(out_dtype)
    xs = (reb, imb) if mb is None else (reb, imb, mb)
    tail, bodies = jax.lax.scan(step, init, xs)
    sig = jnp.concatenate([bodies.reshape(-1), tail])
    return sig[: N + (F - 1) * hop]


def istft_direct_planes(re: jax.Array, im: jax.Array, hop: int,
                        window,
                        fft_backend: str = "auto",
                        frame_chunk: int | None = None) -> jax.Array:
    """Direct (0-iteration) iSTFT with window-sum normalization.

    (re, im): real/imag planes of the [F, N//2+1] rfft-layout spectrum.
    Returns real signal [N + (F-1)*hop].

    Reproduces /root/reference/phase/phase.go:93-133: overlap-add of
    real(IFFT(frame)) * window with window-square accumulation, then
    normalization where window_sum > 0.5*max, proportional fade where
    1e-21 < window_sum <= threshold.

    TPU backend: XLA's native irfft. Measured at the batch-2 serving shape
    (benchmarks/RESULTS.md "inverse-transform backend"): the vector-unit
    FFT beats both matmul formulations for the decode inverse — 1.25 ms vs
    1.57 ms (mm @ HIGH) per 120 audio-s — AND is exact f32, so decode has
    no reduced-precision caveat on any platform. (The matmul FFTs still
    win where their trade fits: CT-HIGHEST for encode, mm-DEFAULT for the
    Griffin-Lim interior.) Pass fft_backend="mxu"/"mm" to force those.

    ``window``: np.ndarray or device array. ``frame_chunk``: per-chunk
    synthesis for hour-scale frame counts (chunked_irfft_overlap_add).
    """
    import numpy as _np

    F = re.shape[0]
    N = (re.shape[1] - 1) * 2
    dtype = re.dtype
    window_arr = (jnp.asarray(window, dtype)
                  if isinstance(window, _np.ndarray) else window)
    backend = "xla" if fft_backend == "auto" else fft_backend
    if frame_chunk:
        sig = chunked_irfft_overlap_add(re, im, hop, window_arr,
                                        frame_chunk, backend)
    else:
        frames = irfft_planes(re, im, N, backend)
        frames_w = frames.astype(window_arr.dtype) * window_arr
        sig = overlap_add(frames_w, hop)
    wsum = window_sum(window_arr, F, hop)
    threshold = 0.5 * jnp.max(wsum)
    return normalize_by_window_sum(sig, wsum, threshold)


def istft_direct(half_spec: jax.Array, hop: int, window: jax.Array,
                 fft_backend: str = "auto") -> jax.Array:
    """Complex-input convenience wrapper over ``istft_direct_planes``."""
    return istft_direct_planes(jnp.real(half_spec), jnp.imag(half_spec),
                               hop, window, fft_backend)


def normalize_by_window_sum(sig: jax.Array, wsum: jax.Array,
                            threshold: jax.Array) -> jax.Array:
    """Stability-thresholded window-sum normalization
    (reference: phase/phase.go:121-130, port: phase.py:207-213).

    - wsum >  threshold: sig / wsum
    - 1e-21 < wsum <= threshold: sig / wsum * (wsum / threshold) == sig / threshold
    - wsum <= 1e-21: untouched

    The fade branch is computed directly as ``sig / threshold`` — identical
    algebra, but the reference's two-step form routes through an
    intermediate up to ~1e4x the result, which costs float32 three digits.
    """
    safe = jnp.where(wsum > 1e-21, wsum, 1.0)
    normalized = sig / safe
    faded = sig / threshold
    out = jnp.where(wsum > threshold, normalized,
                    jnp.where(wsum > 1e-21, faded, sig))
    return out
