"""Structured logging.

The reference's only observability is stderr ``println`` in the Go loaders
(SURVEY.md §5, mel/impl.go:56,64,241). This provides a real logger: per-process
prefixes for multi-host runs and an optional JSON-lines mode for harvesting.
"""
from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Any

_LOGGER_NAME = "gomel_tpu"


class _JsonFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        payload: dict[str, Any] = {
            "ts": round(time.time(), 3),
            "level": record.levelname,
            "process": getattr(record, "jax_process", None),
            "msg": record.getMessage(),
        }
        if record.exc_info:
            payload["exc"] = self.formatException(record.exc_info)
        extra = getattr(record, "fields", None)
        if extra:
            payload.update(extra)
        return json.dumps(payload)


class _ProcessFilter(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:
        try:
            import jax
            record.jax_process = jax.process_index()
        except Exception:
            record.jax_process = 0
        return True


def get_logger(json_lines: bool | None = None) -> logging.Logger:
    """Process-wide gomel_tpu logger. ``GOMEL_TPU_LOG_JSON=1`` switches to
    JSON-lines output; ``GOMEL_TPU_LOG_LEVEL`` sets the level."""
    logger = logging.getLogger(_LOGGER_NAME)
    if logger.handlers:
        return logger
    if json_lines is None:
        json_lines = os.environ.get("GOMEL_TPU_LOG_JSON", "0") == "1"
    handler = logging.StreamHandler(sys.stderr)
    if json_lines:
        handler.setFormatter(_JsonFormatter())
    else:
        handler.setFormatter(logging.Formatter(
            "%(asctime)s %(levelname)s p%(jax_process)s %(name)s: %(message)s"))
    handler.addFilter(_ProcessFilter())
    logger.addHandler(handler)
    logger.setLevel(os.environ.get("GOMEL_TPU_LOG_LEVEL", "INFO"))
    logger.propagate = False
    return logger


def log_event(event: str, **fields: Any) -> None:
    """Structured event helper: ``log_event("encode_done", frames=128)``."""
    get_logger().info(event, extra={"fields": fields})
