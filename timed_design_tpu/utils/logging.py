"""Structured logging (the reference has print+tqdm only, SURVEY.md §5).

One logger for the whole framework; ``configure()`` installs a concise
stderr format, and ``log_event`` emits machine-readable JSON lines when a
file is given (benchmarks/pipelines can tail it).
"""
from __future__ import annotations

import json
import logging
import sys
import time
from pathlib import Path

LOGGER_NAME = "timed_design_tpu"
_event_file = None


def get_logger() -> logging.Logger:
    return logging.getLogger(LOGGER_NAME)


def configure(level: int = logging.INFO, event_file: Path | None = None) -> logging.Logger:
    global _event_file
    logger = get_logger()
    if not logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(
            logging.Formatter("%(asctime)s %(levelname).1s %(name)s: %(message)s",
                              datefmt="%H:%M:%S")
        )
        logger.addHandler(h)
    logger.setLevel(level)
    if event_file is not None:
        if _event_file is not None:  # reconfiguring: don't leak the old fd
            _event_file.close()
        _event_file = open(event_file, "a")
    return logger


def close_event_file() -> None:
    """Close the structured-event sink (tests/long-lived processes)."""
    global _event_file
    if _event_file is not None:
        _event_file.close()
        _event_file = None


def log_event(event: str, **fields) -> None:
    """Emit a structured JSON event line (and an INFO log)."""
    record = {"ts": time.time(), "event": event, **fields}
    get_logger().info("%s %s", event, fields)
    if _event_file is not None:
        _event_file.write(json.dumps(record) + "\n")
        _event_file.flush()
