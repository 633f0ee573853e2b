"""Length-bucketed batching + data-parallel pipelines.

The reference processes one file at a time (SURVEY.md §3); the TPU build runs
utterance batches under one jit. XLA needs static shapes, so variable-length
audio is grouped into length buckets (each bucket = one compiled program) and
padded with the reference's own padding scheme (mel/impl.go:429-455), which
already defines the exact trim-back logic (``is_padded``). True lengths ride
along as a mask source, mirroring how the PNG metadata's ``samples_in_mel``
encodes recoverable length (SURVEY.md §5).

Batches are sharded over the mesh 'data' axis via NamedSharding; with a
multi-host mesh the same code scales out (collectives are only in the
frame-sharded path, parallel/sharded.py).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import MelConfig, PhaseConfig
from ..core.framing import pad_length
from ..core.filterbank import mel_weights, inverse_mel_weights
from ..ops.mel_ops import mel_encode, mel_decode
from ..ops.phase_ops import phase_encode, phase_decode
from ..ops.stft import hann_window
from .mesh import DATA_AXIS


# ---------------------------------------------------------------------------
# Length-bucketed batcher
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class Bucket:
    """One fixed-shape batch: [B, padded_len] plus true lengths."""
    audio: np.ndarray            # [B, L_pad] float32
    lengths: np.ndarray          # [B] original sample counts
    indices: np.ndarray          # [B] positions in the input sequence
    padded_len: int


def make_buckets(utterances: Sequence[np.ndarray], hop: int,
                 max_batch: int = 64,
                 bucket_boundaries: Optional[Sequence[int]] = None
                 ) -> List[Bucket]:
    """Group variable-length utterances into fixed-shape padded batches.

    Each utterance is first padded with the reference formula
    (``pad_length``); utterances mapping to the same bucket boundary are
    stacked. Default boundaries: powers-of-two multiples of ``15*hop``.
    """
    if bucket_boundaries is None:
        base = pad_length(1, hop)
        bucket_boundaries = [base]
        longest = max((len(u) for u in utterances), default=base)
        while bucket_boundaries[-1] < longest:
            bucket_boundaries.append(
                pad_length(bucket_boundaries[-1] * 2, hop))
    else:
        bucket_boundaries = sorted(bucket_boundaries)
    groups: dict[int, list[int]] = {}
    for i, u in enumerate(utterances):
        ref_len = pad_length(len(u), hop)
        b = next((bb for bb in bucket_boundaries if bb >= ref_len), ref_len)
        groups.setdefault(b, []).append(i)

    buckets: List[Bucket] = []
    for b, idxs in sorted(groups.items()):
        for s in range(0, len(idxs), max_batch):
            chunk = idxs[s:s + max_batch]
            audio = np.zeros((len(chunk), b), dtype=np.float32)
            lengths = np.zeros(len(chunk), dtype=np.int64)
            for row, i in enumerate(chunk):
                u = np.asarray(utterances[i], dtype=np.float32)
                audio[row, :len(u)] = u
                lengths[row] = len(u)
            buckets.append(Bucket(audio=audio, lengths=lengths,
                                  indices=np.asarray(chunk), padded_len=b))
    return buckets


def pad_batch_to_multiple(bucket: Bucket, multiple: int) -> Bucket:
    """Pad the batch dimension up to a multiple (for even 'data' sharding);
    padded rows have length 0 and index -1."""
    b = bucket.audio.shape[0]
    target = -(-b // multiple) * multiple
    if target == b:
        return bucket
    pad = target - b
    return Bucket(
        audio=np.pad(bucket.audio, ((0, pad), (0, 0))),
        lengths=np.pad(bucket.lengths, (0, pad)),
        indices=np.pad(bucket.indices, (0, pad), constant_values=-1),
        padded_len=bucket.padded_len)


# ---------------------------------------------------------------------------
# Data-parallel codec pipelines
# ---------------------------------------------------------------------------

class BatchedMel:
    """Data-parallel batched mel codec over a mesh's 'data' axis.

    One compiled program per (batch, length) shape; weights replicated.
    Parity: per-utterance results equal pipelines.mel.Mel (same kernels).
    """

    def __init__(self, config: MelConfig | None = None,
                 mesh: Mesh | None = None, dtype=jnp.float32,
                 gl_momentum: float = 0.0):
        # gl_momentum > 0 opts into fast-GL for every decode from this
        # instance (ops/griffinlim.py); 0.0 = exact reference behavior
        self.config = config or MelConfig()
        self.mesh = mesh
        self.dtype = dtype
        c = self.config
        self._fwd = jnp.asarray(
            mel_weights(c.n_bins, c.num_mels, c.mel_fmin, c.mel_fmax), dtype)
        self._inv = jnp.asarray(
            inverse_mel_weights(c.n_bins, c.num_mels, c.mel_fmin, c.mel_fmax),
            dtype)
        self._window = jnp.asarray(hann_window(c.resolut), dtype)
        self._encode = jax.jit(jax.vmap(
            lambda x: mel_encode(x, c.num_mels, c.resolut, c.window,
                                 self._fwd, self._window)))
        self._decode = jax.jit(jax.vmap(
            lambda m, k: mel_decode(m, c.resolut, c.window, self._inv,
                                    c.griffin_lim_iterations, k,
                                    c.tune_mul, c.tune_add, None,
                                    momentum=float(gl_momentum))))

    def _shard(self, arr):
        if self.mesh is None:
            return arr
        return jax.device_put(arr, NamedSharding(self.mesh, P(DATA_AXIS)))

    def _pad_rows(self, arr):
        """Pad the batch dim to the data-axis multiple; return (arr, B)."""
        n_data = self.mesh.shape[DATA_AXIS] if self.mesh is not None else 1
        b = arr.shape[0]
        target = -(-b // n_data) * n_data
        if target != b:
            arr = jnp.pad(arr, ((0, target - b),) + ((0, 0),) * (arr.ndim - 1))
        return arr, b

    def encode(self, audio_batch) -> jax.Array:
        """[B, L_pad] -> [B, F, num_mels, 2] log-mel (any B: padded
        internally to the mesh's data-axis multiple)."""
        xb, b = self._pad_rows(jnp.asarray(audio_batch, dtype=self.dtype))
        return self._encode(self._shard(xb))[:b]

    def decode(self, logmel_batch, seed: int = 0) -> jax.Array:
        """[B, F, num_mels, 2] -> [B, out_len] via Griffin-Lim."""
        mb, b = self._pad_rows(jnp.asarray(logmel_batch, dtype=self.dtype))
        keys = jax.random.split(jax.random.PRNGKey(seed), mb.shape[0])
        return self._decode(self._shard(mb), self._shard(keys))[:b]

    def encode_buckets(self, utterances: Sequence[np.ndarray],
                       max_batch: int = 64):
        """Variable-length utterances -> generator of (bucket, logmel),
        one device batch in flight at a time; input order is recoverable via
        bucket.indices."""
        for bucket in make_buckets(utterances, self.config.window, max_batch):
            yield bucket, self.encode(bucket.audio)


class BatchedPhase:
    """Data-parallel batched phase codec over a mesh's 'data' axis."""

    def __init__(self, config: PhaseConfig | None = None,
                 mesh: Mesh | None = None, dtype=jnp.float32):
        self.config = config or PhaseConfig()
        self.mesh = mesh
        self.dtype = dtype
        c = self.config
        self._window = jnp.asarray(hann_window(c.resolut), dtype)
        self._encode = jax.jit(jax.vmap(
            lambda x: phase_encode(x, c.num_freqs, c.resolut, c.window,
                                   self._window)))
        self._decode = jax.jit(jax.vmap(
            lambda s: phase_decode(s, c.resolut, c.window,
                                   float(c.volume_boost), None)))

    def _shard(self, arr):
        if self.mesh is None:
            return arr
        return jax.device_put(arr, NamedSharding(self.mesh, P(DATA_AXIS)))

    def _pad_rows(self, arr):
        n_data = self.mesh.shape[DATA_AXIS] if self.mesh is not None else 1
        b = arr.shape[0]
        target = -(-b // n_data) * n_data
        if target != b:
            arr = jnp.pad(arr, ((0, target - b),) + ((0, 0),) * (arr.ndim - 1))
        return arr, b

    def encode(self, audio_batch) -> jax.Array:
        """[B, L_pad] -> [B, F, num_freqs, 2] (any B: padded internally to
        the mesh's data-axis multiple)."""
        xb, b = self._pad_rows(jnp.asarray(audio_batch, dtype=self.dtype))
        return self._encode(self._shard(xb))[:b]

    def decode(self, spec_batch) -> jax.Array:
        """[B, F, num_freqs, 2] -> [B, out_len]."""
        sb, b = self._pad_rows(jnp.asarray(spec_batch, dtype=self.dtype))
        return self._decode(self._shard(sb))[:b]

    def encode_buckets(self, utterances: Sequence[np.ndarray],
                       max_batch: int = 64):
        """Variable-length utterances -> generator of (bucket, spec)."""
        for bucket in make_buckets(utterances, self.config.window, max_batch):
            yield bucket, self.encode(bucket.audio)
