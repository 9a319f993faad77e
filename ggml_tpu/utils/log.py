"""Logging: leveled global logger with a pluggable callback.

Reference: ggml_log_set / ggml_log_internal with levels NONE/DEBUG/INFO/WARN/
ERROR/CONT (include/ggml.h:551-558, src/ggml.c:188-231), default stderr.
"""

from __future__ import annotations

import logging
import os
import sys

_logger: logging.Logger | None = None


def get_logger() -> logging.Logger:
    global _logger
    if _logger is None:
        lg = logging.getLogger("ggml_tpu")
        if not lg.handlers:
            h = logging.StreamHandler(sys.stderr)
            h.setFormatter(logging.Formatter("%(name)s %(levelname)s: %(message)s"))
            lg.addHandler(h)
        lg.setLevel(os.environ.get("GGML_TPU_LOG", "WARNING").upper())
        _logger = lg
    return _logger


def set_log_level(level: str) -> None:
    """reference: ggml_log_set (include/ggml.h:2098) — but leveled via the
    stdlib; set GGML_TPU_LOG=DEBUG for the GGML_DEBUG printf-tier analog."""
    get_logger().setLevel(level.upper())
