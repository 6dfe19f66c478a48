"""Utils: phase timers, structured logging, config dataclasses."""
import logging

import pytest

from timed_design_tpu.utils import PhaseTimer
from timed_design_tpu.utils.logging import configure, get_logger, log_event


def test_phase_timer_accumulates():
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    s = t.summary()
    assert set(s) == {"a", "b"}
    assert s["a"] >= 0 and s["b"] >= 0
    report = t.report()
    assert "a:" in report and "total:" in report


def test_structured_logging(tmp_path, caplog):
    events = tmp_path / "events.jsonl"
    logger = configure(level=logging.INFO, event_file=events)
    assert logger is get_logger()
    with caplog.at_level(logging.INFO, logger="timed_design_tpu"):
        log_event("predict_done", frames=76, model="TIMED")
    assert "predict_done" in caplog.text
    import json

    line = json.loads(events.read_text().splitlines()[-1])
    assert line["event"] == "predict_done" and line["frames"] == 76
    assert "ts" in line
    from timed_design_tpu.utils.logging import close_event_file

    close_event_file()  # don't leak the handle past the test


def test_trace_noop():
    from timed_design_tpu.utils import trace

    with trace(None):
        pass  # no-op without a log dir
