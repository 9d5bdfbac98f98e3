"""Numerical equivalence of the sharded train/eval paths across mesh sizes.

The reference's DDP semantics (train_denoising_syn.py:179: gradient
all-reduce makes N-GPU training equal to 1-GPU training at the same global
batch) must hold for our data-mesh: same global batch, same keys, N steps
on a 1-device mesh vs an 8-device mesh => same parameters.

Runs on the virtual 8-device CPU platform (tests/conftest.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from virnet_tpu.train.mesh import make_mesh, shard_batch


def _tree_max_diff(a, b):
    # host fetch first: leaves are committed to different meshes
    leaves_a = [np.asarray(x) for x in jax.tree_util.tree_leaves(a)]
    leaves_b = [np.asarray(x) for x in jax.tree_util.tree_leaves(b)]
    return max(float(np.max(np.abs(x.astype(np.float32) -
                                   y.astype(np.float32))))
               for x, y in zip(leaves_a, leaves_b))


@pytest.mark.parametrize("n_steps", [3])
def test_denoise_train_equivalence_1_vs_8(n_steps, tmp_path):
    from virnet_tpu.train.loop_denoise import (DenoiseTrainConfig,
                                               DenoiseTrainer)

    def run(n_dev):
        cfg = DenoiseTrainConfig(
            sigma_chn=1, dep_S=3, n_feat=(8, 16), n_resblocks=1,
            batch_size=8, patch_size=32, epochs=2, warmup_epochs=1,
            steps_per_epoch=4, mixed_precision=False,
            save_dir=str(tmp_path / f"d{n_dev}"))
        mesh = make_mesh(jax.devices()[:n_dev])
        trainer = DenoiseTrainer(cfg, mesh=mesh)
        rng = np.random.default_rng(7)
        batches = [rng.random((8, 32, 32, 3), dtype=np.float32)
                   for _ in range(n_steps)]
        losses = []
        for b in batches:
            aux = trainer.run_step(jnp.asarray(b), epoch=0)
            losses.append(float(aux["loss"]))
        return trainer.params, losses

    p1, l1 = run(1)
    p8, l8 = run(8)
    # reduction order differs between the sharded psum and the single-device
    # mean; agreement is relative, not absolute (loss scale ~5e4)
    np.testing.assert_allclose(l1, l8, rtol=1e-5)
    assert _tree_max_diff(p1, p8) < 1e-5, (
        "params diverged between 1-device and 8-device training")


def test_sisr_train_equivalence_1_vs_8(tmp_path):
    from virnet_tpu.train.loop_sisr import SISRTrainConfig, SISRTrainer

    def run(n_dev):
        cfg = SISRTrainConfig(
            sigma_chn=1, dep_S=3, dep_K=2, n_feat=(8, 16), n_resblocks=1,
            extra_mode="both", sf=2, k_size=11, batch_size=8, hr_size=32,
            epochs=2, steps_per_epoch=4, mixed_precision=False,
            save_dir=str(tmp_path / f"s{n_dev}"))
        mesh = make_mesh(jax.devices()[:n_dev])
        trainer = SISRTrainer(cfg, mesh=mesh)
        rng = np.random.default_rng(3)
        hr = jnp.asarray(rng.random((8, 32, 32, 3), dtype=np.float32))
        for _ in range(2):
            aux = trainer.run_step(hr, epoch=0)
        return trainer.params, float(aux["loss"])

    p1, l1 = run(1)
    p8, l8 = run(8)
    assert abs(l1 - l8) / max(abs(l1), 1.0) < 1e-5
    assert _tree_max_diff(p1, p8) < 1e-5


def test_sharded_eval_tta_equivalence():
    """x8-TTA eval forward over a batch sharded on the 8-device mesh equals
    the single-device result (the sharded analogue of the reference's
    per-GPU eval, scripts/denoising_virnet_real_sidd.py:121-136)."""
    from virnet_tpu.eval.tta import tta_x8
    from virnet_tpu.models import build_model

    model = build_model("denoising-syn", dep_S=3, n_feat=(8, 16),
                        n_resblocks=1)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (8, 32, 32, 3), jnp.float32)
    params = model.init(key, x[:1])["params"]

    def forward(z):
        mu, _ = model.apply({"params": params}, z)
        return mu

    ref = np.asarray(jax.jit(lambda z: tta_x8(forward, z))(x))

    mesh = make_mesh(jax.devices()[:8])
    xs = shard_batch(mesh, x)
    out = np.asarray(jax.jit(lambda z: tta_x8(forward, z))(xs))
    np.testing.assert_allclose(ref, out, rtol=0, atol=2e-6)
