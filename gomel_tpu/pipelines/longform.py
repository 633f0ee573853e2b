"""Long-form frame-sharded pipelines — user-facing API over parallel/sharded.

The reference processes arbitrarily long files on one CPU core in O(N)
(SURVEY.md §5); this is the TPU scale-out equivalent: hour-scale audio is
frame-sharded across the mesh's 'frame' axis with one-analysis-window halo
exchange, composing with the 'data' batch axis. This module hides the
FrameShardPlan/padding/trim bookkeeping behind the same encode/decode shapes
as pipelines.mel / pipelines.phase.

Typical use::

    mesh = make_mesh(data=1, frame=8)
    lf = LongFormPhase(PhaseConfig.cli_default(), mesh)
    spec = lf.encode(batch_of_long_audio)   # [B, F, num_freqs, 2]
    wav = lf.decode(spec)                   # [B, out_len]
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..core.config import MelConfig, PhaseConfig
from ..core.filterbank import inverse_mel_weights, mel_weights
from ..core.framing import num_frames, pad_length
from ..parallel import sharded as sh
from ..parallel.mesh import DATA_AXIS, FRAME_AXIS


class _LongFormBase:
    def __init__(self, mesh: Mesh, window: int, resolut: int, dtype):
        self.mesh = mesh
        self.n_frame_shards = mesh.shape[FRAME_AXIS]
        self._hop = window
        self._frame_len = resolut
        self.dtype = dtype
        self._fn_cache: dict = {}

    def _plan(self, n_samples: int) -> sh.FrameShardPlan:
        padded = pad_length(n_samples, self._hop)
        f = num_frames(padded, self._frame_len, self._hop)
        return sh.plan_frame_sharding(f, self._frame_len, self._hop,
                                      self.n_frame_shards)

    def _plan_for_frames(self, f: int) -> sh.FrameShardPlan:
        return sh.plan_frame_sharding(f, self._frame_len, self._hop,
                                      self.n_frame_shards)

    def _get(self, key, builder):
        if key not in self._fn_cache:
            self._fn_cache[key] = builder()
        return self._fn_cache[key]

    def _pad_batch(self, x):
        """Pad the batch dim to a multiple of the data-axis size (zero rows
        are sliced off by the caller via _true_b)."""
        n_data = self.mesh.shape[DATA_AXIS]
        b = x.shape[0]
        target = -(-b // n_data) * n_data
        if target != b:
            x = jnp.pad(x, ((0, target - b),) + ((0, 0),) * (x.ndim - 1))
        return x, b

    def _prep_signal(self, x, plan: sh.FrameShardPlan):
        x = jnp.asarray(x, dtype=self.dtype)
        if x.ndim == 1:
            x = x[None, :]
        x, b = self._pad_batch(x)
        return sh.pad_signal_for_plan(x, plan), b


class LongFormPhase(_LongFormBase):
    """Frame-sharded phase codec for long audio (parity target:
    /root/reference/phase/phase.go buffer APIs, scaled out)."""

    def __init__(self, config: PhaseConfig | None = None,
                 mesh: Mesh | None = None, dtype=jnp.float32):
        if mesh is None:
            raise ValueError("LongFormPhase requires a mesh")
        self.config = config or PhaseConfig()
        super().__init__(mesh, self.config.window, self.config.resolut, dtype)

    def encode(self, x) -> jax.Array:
        """[B, L] (or [L]) -> [B, F, num_freqs, 2] (F = real frame count)."""
        n = np.asarray(x).shape[-1]
        plan = self._plan(n)
        fn = self._get(("enc", plan.n_frames_padded, plan.n_frames), lambda: (
            sh.sharded_phase_encode_fn(self.mesh, plan,
                                       self.config.num_freqs, self.dtype)))
        xp, b = self._prep_signal(x, plan)
        return fn(xp)[:b, : plan.n_frames]

    def decode(self, spec) -> jax.Array:
        """[B, F, num_freqs, 2] -> [B, out_len]."""
        spec = jnp.asarray(spec, dtype=self.dtype)
        plan = self._plan_for_frames(spec.shape[1])
        fn = self._get(("dec", plan.n_frames_padded, plan.n_frames,
                        float(self.config.volume_boost)), lambda: (
            sh.sharded_phase_decode_fn(self.mesh, plan,
                                       float(self.config.volume_boost),
                                       self.dtype)))
        spec_p, b = self._pad_batch(sh.pad_frames_for_plan(spec, plan))
        out = fn(spec_p)
        return out[:b, : plan.out_len]


class LongFormMel(_LongFormBase):
    """Frame-sharded mel codec with sharded Griffin-Lim (parity target:
    /root/reference/mel/mel.go buffer APIs, scaled out)."""

    def __init__(self, config: MelConfig | None = None,
                 mesh: Mesh | None = None, dtype=jnp.float32):
        if mesh is None:
            raise ValueError("LongFormMel requires a mesh")
        self.config = config or MelConfig()
        super().__init__(mesh, self.config.window, self.config.resolut, dtype)
        c = self.config
        self._fwd = mel_weights(c.n_bins, c.num_mels, c.mel_fmin, c.mel_fmax)
        self._inv = inverse_mel_weights(c.n_bins, c.num_mels, c.mel_fmin,
                                        c.mel_fmax)

    def encode(self, x) -> jax.Array:
        """[B, L] (or [L]) -> [B, F, num_mels, 2] log-mel."""
        n = np.asarray(x).shape[-1]
        plan = self._plan(n)
        fn = self._get(("enc", plan.n_frames_padded, plan.n_frames), lambda: (
            sh.sharded_mel_encode_fn(self.mesh, plan, self.config.num_mels,
                                     self._fwd, self.dtype)))
        xp, b = self._prep_signal(x, plan)
        return fn(xp)[:b, : plan.n_frames]

    def decode(self, logmel, seed: int = 0,
               momentum: float = 0.0) -> jax.Array:
        """[B, F, num_mels, 2] -> [B, out_len] via sharded Griffin-Lim.

        ``momentum`` > 0 opts into fast-GL (ops/griffinlim.py): ~2-4x fewer
        iterations for equal convergence at no per-iteration cost — the
        preferred setting for the long-form GL-64 class of workloads.
        """
        logmel = jnp.asarray(logmel, dtype=self.dtype)
        plan = self._plan_for_frames(logmel.shape[1])
        c = self.config
        fn = self._get(("dec", plan.n_frames_padded, plan.n_frames,
                        c.griffin_lim_iterations, momentum), lambda: (
            sh.sharded_mel_decode_fn(self.mesh, plan, self._inv,
                                     c.griffin_lim_iterations,
                                     c.tune_mul, c.tune_add, self.dtype,
                                     momentum=momentum)))
        logmel_p, b = self._pad_batch(sh.pad_frames_for_plan(logmel, plan))
        out = fn(logmel_p, jax.random.PRNGKey(seed))
        return out[:b, : plan.out_len]
