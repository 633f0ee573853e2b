"""High-level codec pipelines: single-chip Mel/Phase and frame-sharded
long-form variants."""
from .mel import Mel
from .phase import Phase
from .longform import (LongFormMel, LongFormPhase, load_gl_checkpoint,
                       load_gl_checkpoint_sharded, prune_gl_checkpoints,
                       save_gl_checkpoint,
                       save_gl_checkpoint_sharded)
from .streaming import StreamingMel, StreamingPhase

__all__ = ["Mel", "Phase", "LongFormMel", "LongFormPhase",
           "StreamingMel", "StreamingPhase",
           "save_gl_checkpoint", "load_gl_checkpoint",
           "save_gl_checkpoint_sharded", "load_gl_checkpoint_sharded",
           "prune_gl_checkpoints"]
