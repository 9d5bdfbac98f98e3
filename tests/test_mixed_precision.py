"""Mixed-precision training sanity: bf16 activations track the fp32 loss."""

import jax.numpy as jnp
import numpy as np

from virnet_tpu.train.loop_denoise import DenoiseTrainConfig, DenoiseTrainer


def _run(mixed, steps=4):
    cfg = DenoiseTrainConfig(
        sigma_chn=1, dep_S=3, n_feat=(8, 16), n_resblocks=1,
        batch_size=8, patch_size=32, epochs=1, warmup_epochs=1,
        steps_per_epoch=steps, mixed_precision=mixed,
        save_dir=f"/tmp/test_mp_{mixed}")
    tr = DenoiseTrainer(cfg)
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.random(
        (cfg.batch_size, cfg.patch_size, cfg.patch_size, 3),
        dtype=np.float32))
    losses = []
    for _ in range(steps):
        aux = tr.run_step(batch, epoch=0)
        losses.append(float(aux["loss"]))
    return np.array(losses)


def test_bf16_tracks_fp32_loss():
    l_fp32 = _run(False)
    l_bf16 = _run(True)
    assert np.all(np.isfinite(l_bf16))
    # same trajectory within bf16 tolerance (losses are O(1e4) early on)
    np.testing.assert_allclose(l_bf16, l_fp32, rtol=0.05)
    # both decrease
    assert l_bf16[-1] < l_bf16[0]
    assert l_fp32[-1] < l_fp32[0]
