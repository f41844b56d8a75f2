"""Leveled, facility-scoped logging (src/logging.{c,h} equivalent).

The reference configures per-facility verbosity through the
``OD_LOG_MODULES`` env var (``<facility>:<level>[,<facility>:<level>]``,
logging.h:69-83) and provides matrix dumpers (logging.h:135-149).  The
TPU build keeps the same contract under ``DTPU_LOG_MODULES`` so a
reference user's muscle memory works:

    DTPU_LOG_MODULES="encoder:4,motion:6" python -m daala_tpu.cli.encode ...

Levels follow the reference: 1 ERR, 2 WARN, 3 NOTICE, 4 INFO,
5+ DEBUG (higher = chattier).  Logging is off (level 0) per facility
unless configured — the hot paths guard with :func:`logging_active`
exactly like ``OD_LOGGING_ENABLED`` so disabled facilities cost one
dict lookup.
"""

from __future__ import annotations

import os
import sys

__all__ = ["OD_LOG_ERR", "OD_LOG_WARN", "OD_LOG_NOTICE", "OD_LOG_INFO",
           "OD_LOG_DEBUG", "logging_active", "od_log", "log_matrix",
           "reload_config"]

OD_LOG_ERR = 1
OD_LOG_WARN = 2
OD_LOG_NOTICE = 3
OD_LOG_INFO = 4
OD_LOG_DEBUG = 5

_LEVELS = {}
_SINK = None      # overridable for tests; default stderr


def reload_config(spec: str = None):
    """(Re)parse the facility:level spec.  Called at import with the
    env var; tests call it directly.  Malformed entries are skipped
    (the reference ignores unparsable OD_LOG_MODULES entries)."""
    _LEVELS.clear()
    spec = os.environ.get("DTPU_LOG_MODULES", "") if spec is None \
        else spec
    for part in spec.split(","):
        if ":" not in part:
            continue
        fac, _, lv = part.partition(":")
        fac = fac.strip()
        try:
            _LEVELS[fac] = int(lv)
        except ValueError:
            continue
    return dict(_LEVELS)


def logging_active(facility: str, level: int) -> bool:
    """od_logging_active: is this (facility, level) enabled?"""
    return _LEVELS.get(facility, 0) >= level


def od_log(facility: str, level: int, fmt, *args):
    """Emit one log line when (facility, level) is enabled.  fmt may
    be a callable (lazily built message) so disabled facilities never
    pay for formatting."""
    if not logging_active(facility, level):
        return False
    msg = fmt() if callable(fmt) else (fmt % args if args else fmt)
    names = {1: "ERR", 2: "WARN", 3: "NOTICE", 4: "INFO"}
    tag = names.get(level, "DEBUG")
    (_SINK or sys.stderr).write(f"[{facility}/{tag}] {msg}\n")
    return True


def log_matrix(facility: str, level: int, label: str, m) -> bool:
    """od_log_matrix_* equivalent: dump a 2D array row by row."""
    if not logging_active(facility, level):
        return False
    import numpy as np

    a = np.asarray(m)
    od_log(facility, level, "%s (%s %s):", label, "x".join(
        str(d) for d in a.shape), a.dtype)
    for row in a.reshape(a.shape[0], -1) if a.ndim > 1 else a[None]:
        od_log(facility, level, "  " + " ".join(str(v) for v in row))
    return True


reload_config()
