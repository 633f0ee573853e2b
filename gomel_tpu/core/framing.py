"""Host-side framing/length arithmetic (pure Python ints — no device code).

Reproduces the reference's padding scheme exactly, including its intentional
off-by-one (pad to a multiple of ``window`` MINUS ONE sample):
- ``pad``:      /root/reference/mel/impl.go:429-455 (identical copy in
                /root/reference/phase/impl.go:424-450 and phase.py:352-377)
- ``isPadded``: /root/reference/mel/impl.go:457-479
- frame count:  gossp ``stft.New(frameShift, frameLen)`` semantics, proven by the
                port at /root/reference/phase.py:119-127.

All functions here are static-shape helpers used OUTSIDE jit: they compute the
concrete lengths that parameterize the jitted device functions.
"""
from __future__ import annotations


def pad_length(current_len: int, window: int) -> int:
    """Padded length for an audio buffer (reference: mel/impl.go:429-455).

    Pads to at least ``15*window``; above that, to the next multiple of ``window``
    minus one sample. Returns the total padded length (>= current_len).
    """
    min_target = 15 * window
    if current_len >= min_target:
        remainder = (current_len - min_target) % window
        pad_len = (window - remainder - 1) if remainder != 0 else 0
    else:
        pad_len = min_target - current_len - 1
    return current_len + pad_len


def is_padded(original_len: int, padded_len: int, window: int) -> bool:
    """Whether ``padded_len`` matches the padding formula applied to
    ``original_len`` (reference: mel/impl.go:457-479)."""
    return padded_len == pad_length(original_len, window)


def num_frames(signal_len: int, frame_len: int, hop: int) -> int:
    """STFT frame count: ``(L - frame_len)/hop + 1``, truncated toward zero
    (gossp semantics; reference port: phase.py:121)."""
    n = (signal_len - frame_len) // hop + 1 if signal_len >= frame_len else 0
    return max(n, 0)


def output_length(n_frames: int, frame_len: int, hop: int) -> int:
    """iSTFT output length: ``frame_len + (n_frames-1)*hop``
    (reference: mel/mel.go:80, phase/phase.go:97)."""
    return frame_len + (n_frames - 1) * hop


def frames_for_padded(original_len: int, window: int, frame_len: int) -> int:
    """Frame count after reference padding is applied to ``original_len``."""
    return num_frames(pad_length(original_len, window), frame_len, window)


def zero_stuff_output_length(n: int, zero_pad: int, zero_shift: int) -> int:
    """Output length of zero-stuffing upsample
    (reference: /root/reference/phase/impl.go:506-529)."""
    if zero_pad == 0:
        return n
    num_groups = (n + zero_pad - 1) // zero_pad
    return n + num_groups * zero_shift
