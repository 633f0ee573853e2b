"""Observability: throughput metrics, profiling, structured logging.

All new relative to the reference, which has none (SURVEY.md §5).
"""
from .logging import get_logger, log_event
from .metrics import (ThroughputResult, measure_throughput,
                      scaling_efficiency, spectral_convergence)
from .profiling import StageTimer, annotate, device_trace

__all__ = [
    "get_logger", "log_event",
    "ThroughputResult", "measure_throughput", "scaling_efficiency",
    "spectral_convergence",
    "StageTimer", "annotate", "device_trace",
]
