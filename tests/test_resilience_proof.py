"""Kill/resume bitwise-equivalence proof, test-sized.

Runs the cli/resilience_proof.py harness end to end with the production
denoise trainer CLI as real subprocesses on the virtual CPU mesh: run A
uninterrupted, run B SIGKILLed mid-epoch-2 and relaunched with --resume
latest, final orbax checkpoints compared leaf-for-leaf bitwise.  The
full-scale on-chip proof (2 x 10k-step virtual epochs) uses the same
harness; results in BASELINE.md.

Reference semantics being improved on: train_denoising_syn.py:91-105,
262-268 (weights-only save + scheduler replay — not bitwise-resumable).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
SET5 = Path("/root/reference/test_data/Set5")


def test_kill_resume_bitwise(tmp_path):
    cfg = {
        "im_chn": 3, "sigma_chn": 1, "dep_S": 2, "n_feat": [16, 32],
        "n_resblocks": 1, "extra_mode": "Input", "noise_cond": "True",
        "batch_size": 8, "patch_size": 32, "warmup_epochs": 1,
        "lr": 1e-4, "lr_min": 1e-6, "print_freq": 2,
        "mixed_precision": "False",
        "train_data": [[str(SET5), "*.bmp"]],
        "val_data": str(tmp_path / "empty_val"),
        "device_records_per_image": 2, "device_record_size": 48,
    }
    (tmp_path / "empty_val").mkdir()
    cfg_path = tmp_path / "base.json"
    cfg_path.write_text(json.dumps(cfg))

    env = dict(os.environ)   # inherits the 8-device XLA_FLAGS + cache
    out = subprocess.run(
        [sys.executable, "-m", "virnet_tpu.cli.resilience_proof",
         "--config", str(cfg_path), "--epochs", "2",
         "--steps_per_epoch", "60", "--kill_step", "10",
         "--work_dir", str(tmp_path / "work"), "--platform", "cpu",
         "--timeout_s", "600", "--override", "device_data=true"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    assert out.returncode == 0, f"harness failed:\n{out.stdout}\n{out.stderr}"
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["match"] is True, result
    assert result["final_ckpt_step"] == [2, 2]
    assert result["leaves_compared"] > 10
    # the SIGKILL really landed mid-epoch-2: at kill time the only
    # checkpoint on disk was the epoch-1 boundary save, so the relaunch
    # genuinely re-trained the killed epoch from restored state
    assert result["ckpt_step_at_kill"] == 1, result
