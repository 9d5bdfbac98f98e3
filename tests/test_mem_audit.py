"""tools/mem_audit.py — smoke: the instrumented loop runs, samples, and
summarizes.  The real audits (multi-hour CPU + chip runs) are recorded
in BASELINE.md "round-5 bounded-memory audit"; this pins the harness so
it keeps working for future long-regime gating.
"""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_mem_audit_smoke(tmp_path):
    out = tmp_path / "audit.jsonl"
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "mem_audit.py"),
         "--epochs", "2", "--steps", "2", "--batch", "8", "--patch", "32",
         "--no_tb", "--no_val", "--probe_trim",
         "--out", str(out), "--save_dir", str(tmp_path / "run")],
        capture_output=True, text=True, cwd=REPO, timeout=420,
        env={**__import__("os").environ, "VIRNET_TPU_PLATFORM": "cpu"})
    assert proc.returncode == 0, proc.stderr[-2000:]
    recs = [json.loads(ln) for ln in out.read_text().splitlines()]
    tags = [r["tag"] for r in recs]
    assert tags[0] == "start" and tags.count("epoch") == 2
    assert tags[-1] == "summary"
    summary = recs[-1]
    assert summary["epochs"] == 2
    assert "rss_slope_mb_per_h" in summary
    epoch_recs = [r for r in recs if r["tag"] == "epoch"]
    assert all(r["rss_mb"] > 0 and "rss_after_trim_mb" in r
               for r in epoch_recs)
