"""Framing/padding arithmetic tests (reference: mel/impl.go:429-479)."""
import conftest  # noqa: F401  (forces CPU backend)

from hypothesis import given, settings, strategies as st

from gomel_tpu.core.framing import (
    is_padded, num_frames, output_length, pad_length, zero_stuff_output_length)


def reference_pad_len(current_len, window):
    """Literal transcription of the Go pad() length math (mel/impl.go:429-455)."""
    min_target = 15 * window
    pad_len = 0
    if current_len >= min_target:
        remainder = (current_len - min_target) % window
        if remainder != 0:
            pad_len = window - remainder - 1
    else:
        pad_len = min_target - current_len - 1
    return current_len + pad_len


@given(st.integers(0, 10_000_000), st.sampled_from([256, 1280, 480, 1024]))
@settings(max_examples=300, deadline=None)
def test_pad_length_matches_reference(n, window):
    assert pad_length(n, window) == reference_pad_len(n, window)


@given(st.integers(0, 1_000_000), st.sampled_from([256, 1280]))
@settings(max_examples=300, deadline=None)
def test_is_padded_roundtrip(n, window):
    padded = pad_length(n, window)
    assert is_padded(n, padded, window)
    # the off-by-one design: above the floor, padded length is a multiple of
    # window MINUS ONE (or exact) relative to the 15*window base
    if n >= 15 * window and (n - 15 * window) % window != 0:
        assert (padded - 15 * window) % window == window - 1


def test_pad_minimum_floor():
    # below 15*window everything pads to 15*window - 1
    assert pad_length(0, 256) == 15 * 256 - 1
    assert pad_length(100, 1280) == 15 * 1280 - 1
    # at exactly the floor: no padding
    assert pad_length(15 * 256, 256) == 15 * 256


@given(st.integers(4096, 500_000))
@settings(max_examples=100, deadline=None)
def test_num_frames_gossp_semantics(L):
    # (L - frame_len)//hop + 1 (phase.py:121)
    f = num_frames(L, 4096, 1280)
    assert f == (L - 4096) // 1280 + 1
    assert output_length(f, 4096, 1280) == 4096 + (f - 1) * 1280


def test_zero_stuff_output_length():
    # Go: n + ceil(n/zero_pad)*zero_shift (phase/impl.go:512-513)
    assert zero_stuff_output_length(10, 1, 1) == 20
    assert zero_stuff_output_length(10, 2, 1) == 15
    assert zero_stuff_output_length(3, 2, 1) == 5
    assert zero_stuff_output_length(7, 0, 0) == 7
