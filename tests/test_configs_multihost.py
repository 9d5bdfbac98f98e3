"""Config-file completeness (reference ships configs/sisr_x{2,3,4}.json) and
init_multihost failure semantics (train_denoising_syn.py:35-39 analogue)."""

import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

from virnet_tpu.config import load_config  # noqa: E402
from virnet_tpu.train import mesh as mesh_mod  # noqa: E402


@pytest.mark.parametrize("sf", [2, 3, 4])
def test_sisr_config_files_build_trainers(sf, tmp_path):
    """Every reference SISR scale has a config that builds a real trainer
    (reference: configs/sisr_x2.json / sisr_x3.json / sisr_x4.json)."""
    cfg = load_config(REPO / f"configs/sisr_x{sf}.json")
    assert cfg["sf"] == sf
    assert cfg["hr_size"] % sf == 0
    assert cfg["k_size"] == 21
    cfg["save_dir"] = str(tmp_path / f"x{sf}")
    from virnet_tpu.cli.train_sisr import build_trainer
    trainer = build_trainer(cfg)
    assert trainer.cfg.sf == sf
    # the reference's per-scale hyperparameter differences are preserved
    if sf == 2:
        assert trainer.cfg.lr == pytest.approx(1e-4)
        assert trainer.cfg.clip_grad_R == pytest.approx(1e2)
    else:
        assert trainer.cfg.lr == pytest.approx(2e-4)
        assert trainer.cfg.clip_grad_R == pytest.approx(5e2)


def test_init_multihost_raises_when_multiprocess_requested(monkeypatch):
    """An explicit num_processes>1 request must never silently degrade to a
    single-process run."""
    def boom(**kwargs):
        raise RuntimeError("bad coordinator")

    monkeypatch.setattr(mesh_mod.jax.distributed, "initialize", boom)
    with pytest.raises(RuntimeError, match="multi-host init failed"):
        mesh_mod.init_multihost("nonsense:1234", num_processes=2,
                                process_id=0)


def test_init_multihost_logs_single_process(monkeypatch, caplog):
    def boom(**kwargs):
        raise RuntimeError("already initialized")

    monkeypatch.setattr(mesh_mod.jax.distributed, "initialize", boom)
    with caplog.at_level("WARNING", logger="virnet_tpu"):
        n = mesh_mod.init_multihost()
    assert n == 1
    assert any("single-process" in r.message for r in caplog.records)


_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from virnet_tpu.train.mesh import init_multihost
n = init_multihost(sys.argv[1], num_processes=2, process_id=int(sys.argv[2]))
assert n == 2, n
assert jax.process_index() == int(sys.argv[2])
print("OK", n)
"""


def test_init_multihost_two_process_cpu_smoke():
    """Real 2-process jax.distributed bring-up over localhost (CPU backend).

    Exercises the coordination plumbing the trainers rely on for multi-host
    (SURVEY.md §5.8).  Skipped if this jaxlib cannot form the cluster in
    time (some builds lack the distributed service on CPU).
    """
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    addr = f"127.0.0.1:{port}"
    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, addr, str(i)],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(2)]
    try:
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=120)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                pytest.skip("distributed CPU bring-up timed out here")
            outs.append((p.returncode, out))
        if any(rc != 0 for rc, _ in outs):
            if any("UNIMPLEMENTED" in out or "not supported" in out
                   for _, out in outs):
                pytest.skip("jax.distributed unsupported on this platform")
            raise AssertionError(f"2-process init failed: {outs}")
        assert all("OK 2" in out for _, out in outs)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()


_STEP_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
import jax
jax.config.update("jax_platforms", "cpu")
from virnet_tpu.train.mesh import init_multihost, make_mesh
n = init_multihost(sys.argv[1], num_processes=2, process_id=int(sys.argv[2]))
assert n == 2, n
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4, jax.local_device_count()

import numpy as np
import jax.numpy as jnp
from virnet_tpu.train.loop_denoise import DenoiseTrainConfig, DenoiseTrainer

mesh = make_mesh()            # global 8-device data mesh across 2 processes
cfg = DenoiseTrainConfig(
    sigma_chn=1, dep_S=3, n_feat=(8, 16), n_resblocks=1,
    batch_size=16, patch_size=32, epochs=2, warmup_epochs=1,
    steps_per_epoch=4, save_dir="/tmp/virnet_mh_dryrun_%s" % sys.argv[2])
trainer = DenoiseTrainer(cfg, mesh=mesh)
rng = np.random.default_rng(0)        # same global batch on both processes
batch = rng.random((cfg.batch_size, cfg.patch_size, cfg.patch_size, 3),
                   dtype=np.float32)
aux = trainer.run_step(jnp.asarray(batch), epoch=0)
l0 = float(aux["loss"])
aux = trainer.run_step(jnp.asarray(batch), epoch=0)
l1 = float(aux["loss"])
assert np.isfinite(l0) and np.isfinite(l1), (l0, l1)
print("STEP-OK", repr(l0), repr(l1))
"""


def test_multihost_two_process_train_step():
    """One REAL train step over a 2-process x 4-device global mesh
    (VERDICT r4 item 7): coordinator + worker each hold 4 virtual CPU
    devices, form the 8-device data mesh, and run two optimization steps
    end to end.  Both processes must report the identical (psum-reduced,
    replicated) loss.  Skipped only if this jaxlib cannot form the
    cluster (same guard as the bring-up smoke above)."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    addr = f"127.0.0.1:{port}"
    procs = [subprocess.Popen(
        [sys.executable, "-c", _STEP_WORKER, addr, str(i)],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(2)]
    try:
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=600)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                pytest.skip("distributed CPU bring-up timed out here")
            outs.append((p.returncode, out))
        if any(rc != 0 for rc, _ in outs):
            if any("UNIMPLEMENTED" in out or "not supported" in out
                   for _, out in outs):
                pytest.skip("jax.distributed unsupported on this platform")
            raise AssertionError(f"2-process train step failed: {outs}")
        lines = [next(ln for ln in out.splitlines() if "STEP-OK" in ln)
                 for _, out in outs]
        assert lines[0] == lines[1], lines   # identical replicated losses
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()


def test_maybe_init_multihost_skips_without_keys(monkeypatch):
    """Single-host configs (no multihost keys) must not touch
    jax.distributed at all."""
    from virnet_tpu.cli import common as cli_common

    def boom(*a, **k):
        raise AssertionError("init_multihost must not be called")

    monkeypatch.setattr(mesh_mod, "init_multihost", boom)
    assert cli_common.maybe_init_multihost({"lr": 1e-4}) == 1


def test_maybe_init_multihost_passes_config_topology(monkeypatch):
    """Trainer configs carry the pod topology the reference passed via the
    DDP launcher env (train_denoising_syn.py:35-39)."""
    from virnet_tpu.cli import common as cli_common
    seen = {}

    def fake(coordinator_address=None, num_processes=None, process_id=None):
        seen.update(addr=coordinator_address, n=num_processes,
                    pid=process_id)
        return num_processes

    monkeypatch.setattr(mesh_mod, "init_multihost", fake)
    logs = []
    n = cli_common.maybe_init_multihost(
        {"coordinator_address": "host0:8476", "num_processes": 4,
         "process_id": 2}, log_fn=logs.append)
    assert n == 4
    assert seen == dict(addr="host0:8476", n=4, pid=2)
    assert any("multi-host" in m for m in logs)


def test_maybe_init_multihost_flag_only_autodetect(monkeypatch):
    """`multihost: true` alone uses the TPU metadata autodetect (all-None
    initialize)."""
    from virnet_tpu.cli import common as cli_common
    calls = []

    def fake(coordinator_address=None, num_processes=None, process_id=None):
        calls.append((coordinator_address, num_processes, process_id))
        return 1

    monkeypatch.setattr(mesh_mod, "init_multihost", fake)
    assert cli_common.maybe_init_multihost({"multihost": "True"},
                                           log_fn=lambda m: None) == 1
    assert calls == [(None, None, None)]
