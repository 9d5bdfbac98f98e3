"""RSS watchdog: bounded host memory for multi-day runs via re-exec.

The round-5 memory audit (BASELINE.md "round-5 bounded-memory audit")
attributes the chip trainer's RSS growth to the image's relay client —
non-Python, untrimmable, outside the repo — so the bound is a process
re-exec at an epoch boundary, free because kill/resume is bitwise
(tests/test_resilience_proof.py).  Unit tests pin the watchdog mechanics;
the end-to-end test runs the production syn trainer CLI with a 1 MB limit
so EVERY epoch boundary triggers a real os.execv relaunch, and asserts the
three-lineage run still finishes all epochs with a final checkpoint.

The reference has no analogue (its runs leak nothing but also cannot
resume bitwise — train_denoising_syn.py:91-105 replays the scheduler).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

from virnet_tpu.train import resilience

REPO = Path(__file__).resolve().parents[1]
SET5 = Path("/root/reference/test_data/Set5")


def test_rss_mb_reads_proc():
    mb = resilience.rss_mb()
    assert 10.0 < mb < 1e6  # a live CPython process is tens of MB at least


def test_reexec_argv_appends_resume():
    argv = resilience.reexec_argv("pkg.mod", ["--config", "c.json"])
    assert argv[:3] == [sys.executable, "-m", "pkg.mod"]
    assert argv[3:] == ["--config", "c.json", "--resume", "latest"]
    # idempotent when --resume already present
    argv2 = resilience.reexec_argv("pkg.mod", ["--resume", "7"])
    assert argv2[3:] == ["--resume", "7"]


def test_watchdog_below_limit_noop():
    calls = []
    fired = resilience.maybe_reexec_on_rss(
        1e9, ["x"], log_fn=lambda *_: None,
        _exec=lambda *a: calls.append(a), _rss=lambda: 100.0)
    assert fired is False and not calls


def test_watchdog_disabled():
    assert resilience.maybe_reexec_on_rss(0, ["x"], _rss=lambda: 1e9) is False


def test_watchdog_fires_cleanup_then_exec(monkeypatch):
    monkeypatch.delenv(resilience._RSS_RESTART_ENV, raising=False)
    order = []
    fired = resilience.maybe_reexec_on_rss(
        100.0, ["/bin/prog", "a", "b"], log_fn=lambda *_: None,
        cleanup=lambda: order.append("cleanup"),
        _exec=lambda p, a: order.append(("exec", p, a)),
        _rss=lambda: 101.0)
    assert fired is True
    assert order == ["cleanup", ("exec", "/bin/prog", ["/bin/prog", "a", "b"])]
    assert resilience.rss_restart_count() == 1


def test_watchdog_survives_cleanup_error(monkeypatch):
    monkeypatch.delenv(resilience._RSS_RESTART_ENV, raising=False)
    execs = []

    def bad_cleanup():
        raise RuntimeError("writer already closed")

    fired = resilience.maybe_reexec_on_rss(
        1.0, ["p"], log_fn=lambda *_: None, cleanup=bad_cleanup,
        _exec=lambda p, a: execs.append(p), _rss=lambda: 2.0)
    assert fired is True and execs == ["p"]


def test_trainer_reexec_end_to_end(tmp_path):
    """Production syn trainer + rss_limit_mb=1: every epoch boundary
    re-execs (any live process exceeds 1 MB), and the 3-lineage chain
    still completes both epochs with a final checkpoint on disk."""
    cfg = {
        "im_chn": 3, "sigma_chn": 1, "dep_S": 2, "n_feat": [16, 32],
        "n_resblocks": 1, "extra_mode": "Input", "noise_cond": "True",
        "batch_size": 8, "patch_size": 32, "epochs": 2,
        "warmup_epochs": 1, "steps_per_epoch": 12, "lr": 1e-4,
        "lr_min": 1e-6, "print_freq": 6, "mixed_precision": "False",
        "train_data": [[str(SET5), "*.bmp"]],
        "val_data": str(tmp_path / "empty_val"),
        "device_data": "True",
        "device_records_per_image": 2, "device_record_size": 48,
        "save_dir": str(tmp_path / "run"), "rss_limit_mb": 1,
    }
    (tmp_path / "empty_val").mkdir()
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))

    env = dict(os.environ)
    env["VIRNET_TPU_PLATFORM"] = "cpu"  # wins over sitecustomize's axon pin
    env.pop(resilience._RSS_RESTART_ENV, None)
    out = subprocess.run(
        [sys.executable, "-m", "virnet_tpu.cli.train_denoising_syn",
         "--config", str(cfg_path)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, f"trainer failed:\n{out.stdout[-3000:]}\n" \
                                f"{out.stderr[-3000:]}"

    log = (tmp_path / "run" / "train.log").read_text()
    assert "re-exec #1" in log, log[-2000:]  # epoch-0 boundary relaunch
    assert "re-exec #2" in log, log[-2000:]  # epoch-1 boundary relaunch
    # both epochs trained to completion across the lineage
    assert "epoch 2 took" in log

    from virnet_tpu.train.checkpoint import CheckpointManager
    assert CheckpointManager(tmp_path / "run").latest_step() == 2
