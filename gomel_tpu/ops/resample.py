"""Zero-stuffing upsampler.

Reproduces /root/reference/phase/impl.go:506-529 (port: phase.py:513-549):
after every ``zero_pad`` input samples insert ``zero_shift`` zeros; kept samples
are multiplied by ``1 + zero_shift`` (energy compensation). The trailing partial
group still reserves ``zero_shift`` zeros of output length (Go allocates
``n + ceil(n/zero_pad)*zero_shift`` and leaves the tail at zero).

Vectorized as a reshape + concat — works on numpy and jnp arrays alike.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def zero_stuff_upsample(audio, zero_pad: int, zero_shift: int):
    """Insert zeros; returns an array of length n + ceil(n/zero_pad)*zero_shift."""
    if zero_pad == 0:
        return audio
    xp = jnp if isinstance(audio, jnp.ndarray) else np
    n = audio.shape[0]
    num_groups = (n + zero_pad - 1) // zero_pad
    boost = float(1 + zero_shift)
    padded = xp.pad(audio, (0, num_groups * zero_pad - n)) * boost
    groups = padded.reshape(num_groups, zero_pad)
    zeros = xp.zeros((num_groups, zero_shift), dtype=audio.dtype)
    out = xp.concatenate([groups, zeros], axis=1).reshape(-1)
    return out[: n + num_groups * zero_shift]
