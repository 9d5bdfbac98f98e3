"""tools/parity_gate.py — the round-start released-weights probe.

The gate must (a) report `blocked` with an armed-harness detail when the
reference model_zoo has no .pth (the shipped zero-egress image), and
(b) flip to `weights_present` and list the files the moment any appear
(VERDICT r4 item 8: the acceptance test fires the day weights exist).
"""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_gate(*args):
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "parity_gate.py"), *args],
        capture_output=True, text=True, cwd=REPO)
    assert proc.returncode == 0, proc.stderr
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_gate_blocked_without_weights(tmp_path):
    (tmp_path / "model_zoo").mkdir()
    rec = run_gate("--ref", str(tmp_path))
    assert rec["status"] == "blocked"
    assert rec["pth_files"] == []
    assert "armed" in rec["detail"]


def test_gate_detects_weights(tmp_path):
    zoo = tmp_path / "model_zoo"
    zoo.mkdir()
    (zoo / "virnet_denoising_syn.pth").write_bytes(b"\x00")
    rec = run_gate("--ref", str(tmp_path))
    assert rec["status"] == "weights_present"
    assert rec["pth_files"] == ["virnet_denoising_syn.pth"]


def test_gate_on_shipped_reference():
    # the real probe against /root/reference: either outcome is valid,
    # but the record must be well-formed
    rec = run_gate()
    assert rec["metric"] == "released_weights_parity_gate"
    assert rec["status"] in ("blocked", "weights_present")
