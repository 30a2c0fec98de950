"""Structured, colored logging.

Replaces the reference's thrice-duplicated ``bcolors`` ANSI print class
(``src/main.py:35-44``, ``src/models/resnet.py:11-20``,
``src/export_eval.py:11-20``) with one standard-library ``logging`` setup.
"""

from __future__ import annotations

import logging
import sys
import time

_COLORS = {
    logging.DEBUG: "\033[94m",  # blue
    logging.INFO: "\033[92m",  # green
    logging.WARNING: "\033[93m",  # yellow
    logging.ERROR: "\033[91m",  # red
    logging.CRITICAL: "\033[95m",  # magenta
}
_RESET = "\033[0m"


class _ColorFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        color = _COLORS.get(record.levelno, "")
        level = f"{color}[{record.levelname}]{_RESET}"
        return f"{level} {record.name}: {record.getMessage()}"


_configured = False


def get_logger(name: str = "hipac") -> logging.Logger:
    global _configured
    if not _configured:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(_ColorFormatter())
        root = logging.getLogger("hipac")
        root.addHandler(handler)
        root.setLevel(logging.INFO)
        root.propagate = False
        _configured = True
    if name != "hipac" and not name.startswith("hipac."):
        name = f"hipac.{name}"
    return logging.getLogger(name)


class Timer:
    """Wall-clock stage timer; the rebuild's lightweight tracing hook."""

    def __init__(self, name: str, logger: logging.Logger | None = None):
        self.name = name
        self.logger = logger or get_logger("timer")
        self.elapsed = 0.0

    def __enter__(self) -> "Timer":
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        self.elapsed = time.perf_counter() - self._start
        self.logger.info("%s took %.3fs", self.name, self.elapsed)
