"""High-level codec pipelines: single-chip Mel/Phase and frame-sharded
long-form variants."""
from .mel import Mel
from .phase import Phase
from .longform import LongFormMel, LongFormPhase
from .streaming import StreamingMel, StreamingPhase

__all__ = ["Mel", "Phase", "LongFormMel", "LongFormPhase",
           "StreamingMel", "StreamingPhase"]
