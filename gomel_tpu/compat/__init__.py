"""Compatibility layer: drop-in module surfaces of the reference APIs.

``gomel_tpu.compat.phase`` mirrors /root/reference/phase.py (the PyPI
``phase-spectrogram`` package) so existing users can switch imports without
code changes while compute runs on TPU kernels.
"""
from . import phase

__all__ = ["phase"]
