"""scripts/external_parity.py skip-path self-test (VERDICT r4 next #8).

This image has none of the external dependencies (aposteriori, ampal,
SCWRL4, release .h5 files, streamlit) — exactly the environment where the
script must degrade to a clean all-skip run, so that the one command is
known runnable on the day an environment with the dependencies appears.
"""
from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_external_parity_all_skips_cleanly(tmp_path):
    out = tmp_path / "PARITY_RESULTS.md"
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "external_parity.py"),
         "--all", "--checks", "voxel,ampal,scwrl,release,streamlit",
         "--models-dir", str(tmp_path / "nonexistent_models"),
         "--output", str(out)],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    text = out.read_text()
    # every dependency-gated check must be present and SKIP with its
    # install step named — a FAIL or a crash here means the closure
    # command would not run on the machine that finally has the deps
    for name, hint in (
        ("voxel", "aposteriori"),
        ("ampal", "ampal"),
        ("scwrl", "Scwrl4"),
        ("release", ".h5"),
        ("streamlit", "streamlit"),
    ):
        assert f"| {name} | SKIP |" in text, (name, text)
        assert hint in text
    assert "Failed: none." in text


def test_external_parity_unknown_check_errors(tmp_path):
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "external_parity.py"),
         "--checks", "nonsense", "--output", str(tmp_path / "x.md")],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode != 0
    assert "unknown check" in proc.stdout + proc.stderr
