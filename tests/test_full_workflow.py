"""examples/full_workflow.py runs the whole reference pipeline in one
command and asserts its own artifact tree — executing it IS the
integration test (VERDICT r2 item 7)."""
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.mark.slow
def test_full_workflow_example(tmp_path):
    r = subprocess.run(
        [sys.executable, str(REPO / "examples" / "full_workflow.py"),
         str(tmp_path / "wf"), "--cpu"],
        capture_output=True, text=True, timeout=1800,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    assert "workflow complete" in r.stdout
    # spot-check the tree beyond the script's own assertions
    wf = tmp_path / "wf"
    assert (wf / "rotamer_analysis" / "scwrl_scores.csv").exists()
    assert (wf / "af2_properties.json").exists()
    assert list((wf / "plots").glob("*.png"))
