"""Leveled logger — the runtime equivalent of the reference's
compile-time log levels (util/logger.cpp:4-40, `log(msg, level)` with
VPT_ERROR / VPT_WARNING / VPT_LOG gated by LOG_LEVEL_* defines).

The reference picks the level at build time (CMakeLists.txt:35-45);
here it is an env var / runtime setting — the config-over-#define rule
this port follows everywhere (SURVEY.md §5).

Usage:
    from vpt_tpu.utils.logger import log, VPT_ERROR, VPT_WARNING, VPT_LOG
    log("scene built", VPT_LOG)
"""

from __future__ import annotations

import os
import sys
import time

VPT_ERROR, VPT_WARNING, VPT_LOG = 0, 1, 2
_NAMES = {VPT_ERROR: "ERROR", VPT_WARNING: "WARNING", VPT_LOG: "LOG"}

_level = {"error": VPT_ERROR, "warning": VPT_WARNING, "log": VPT_LOG,
          "none": -1}.get(os.environ.get("VPT_LOG_LEVEL", "log").lower(),
                          VPT_LOG)


def set_level(level: int):
    """Runtime override of the threshold (messages with level <= the
    threshold are printed; -1 silences everything)."""
    global _level
    _level = level


def get_level() -> int:
    return _level


def log(msg: str, level: int = VPT_LOG):
    """Print `msg` if `level` is within the configured threshold.
    Format mirrors logger.cpp: level tag + message, to stderr."""
    if level <= _level:
        tag = _NAMES.get(level, "LOG")
        ts = time.strftime("%H:%M:%S")
        print(f"[vpt {ts} {tag}] {msg}", file=sys.stderr, flush=True)
