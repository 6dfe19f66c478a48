"""Utilities: timing/profiling, shared config."""
from .timing import PhaseTimer, block_until_ready, trace  # noqa: F401
