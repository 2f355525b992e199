"""Framework logger (reference: src/AWARE/utils/logger.py:1-30).

Stdlib logger with ANSI-colored formatting.  Named ``aware_tpu``
(the reference logger carries the legacy name "deltamark").  Unlike the
reference it streams to STDERR: the CLI surfaces (``python -m
aware_tpu.eval`` et al.) print JSON artifacts on stdout, and the
round-5 chip run showed load()'s INFO lines corrupting a redirected
``> results.json``.
"""

import logging
import sys

_COLORS = {
    logging.DEBUG: "\x1b[36m",     # cyan
    logging.INFO: "\x1b[32m",      # green
    logging.WARNING: "\x1b[33m",   # yellow
    logging.ERROR: "\x1b[31m",     # red
    logging.CRITICAL: "\x1b[41m",  # red background
}
_RESET = "\x1b[0m"


class _ColorFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        color = _COLORS.get(record.levelno, "")
        prefix = f"{color}[{record.levelname}]{_RESET}" if color else f"[{record.levelname}]"
        return f"{prefix} {record.name}: {record.getMessage()}"


logger = logging.getLogger("aware_tpu")
if not logger.handlers:
    _handler = logging.StreamHandler(sys.stderr)
    _handler.setFormatter(_ColorFormatter())
    logger.addHandler(_handler)
    logger.setLevel(logging.INFO)
    logger.propagate = False
