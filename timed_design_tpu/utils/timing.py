"""Phase timing + profiling utilities (first-class, per SURVEY.md §5).

The reference's only observability is tqdm + wall-clock prints in the UI
(ui.py:914-955). Here timing is a small structured subsystem: `PhaseTimer`
records named phases (voxelisation, prediction, decode, ...) and can emit a
summary dict; `trace` wraps `jax.profiler` for on-TPU traces.
"""
from __future__ import annotations

import contextlib
import time
import typing as t


class PhaseTimer:
    def __init__(self):
        self.phases: dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.phases[name] = self.phases.get(name, 0.0) + time.perf_counter() - t0

    def summary(self) -> dict[str, float]:
        return dict(self.phases)

    def report(self) -> str:
        total = sum(self.phases.values())
        lines = [f"{k}: {v:.3f}s ({100*v/max(total,1e-9):.1f}%)" for k, v in self.phases.items()]
        lines.append(f"total: {total:.3f}s")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str | None = None):
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def block_until_ready(tree):
    import jax

    return jax.block_until_ready(tree)
