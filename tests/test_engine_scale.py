"""Engine memory stays bounded at benchmark scale (VERDICT r3 item 2).

Runs scripts/engine_scale_bench.py in a fresh subprocess (so ru_maxrss is
this run's high-water mark): 80k frames through TWO 338-head models with
--ensemble. The round-3 engine held every model's float32 matrix plus
per-member float64 copies and an np.stack of all of them — ~2.5 GB at this
scale; the streaming engine keeps one float16 decode matrix per model and
a single float64 running sum (~0.7 GB including the JAX runtime).
"""
from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_engine_memory_bounded_at_scale(tmp_path):
    import os

    # glibc spawns extra malloc arenas under scheduler contention; on a
    # loaded 1-vCPU host that fragmentation alone moved peak RSS by
    # hundreds of MB run-to-run. Pin arenas so the measurement tracks the
    # engine's buffers, not allocator weather.
    env = {**os.environ, "MALLOC_ARENA_MAX": "2"}
    proc = subprocess.run(
        [
            sys.executable,
            str(REPO / "scripts" / "engine_scale_bench.py"),
            "--frames", "80000",
            "--cpu", "--table",
            "--workdir", str(tmp_path),
        ],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=tmp_path,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    # full report (incl. rss_phases_mb) lands in captured stdout on failure
    print(json.dumps(report))
    Path("/tmp/engine_scale_last_report.json").write_text(json.dumps(report))
    assert report["frames"] == 80000
    assert report["chains"] == 800
    # the full artifact set, per model + the ensemble
    for stem in ("ScaleA", "ScaleB", "ensemble"):
        for ext in (".csv", "_rot.csv", ".fasta", ".txt"):
            assert f"{stem}{ext}" in report["artifacts"]
    # 80k x 338: f16 decode matrices 2 x 54 MB + float64 ensemble sum
    # 216 MB + loader/runtime ~= 0.7 GB. The pre-streaming engine measured
    # ~2.5 GB here (f32 matrices + f64 members + stack); isolation runs of
    # the streaming engine measure ~1.0 GB, so 1400 keeps headroom while
    # failing any reintroduced per-member float64 accumulation (+1.7 GB).
    # History: this pin flaked inside full-suite runs at 5-6 GB "peak" —
    # ru_maxrss is fork-inherited from the fat pytest parent, which the
    # bench now neutralizes by resetting the kernel RSS watermark
    # (/proc/self/clear_refs) at start; rss_phases_mb["start"] in the
    # report (printed above on failure) proves the reset worked (~170 MB,
    # not gigabytes).
    assert report["rss_phases_mb"]["start"] < 600, report
    assert report["peak_rss_mb"] < 1400, report
