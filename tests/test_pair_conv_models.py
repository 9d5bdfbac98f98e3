"""Model-level parity of the Pallas pixel-pair conv path (conv_impl='pair')
vs the XLA conv path, sharing one parameter tree (models/common.ConvParams
declares identical params).  Reference ops: networks/DnCNN.py:37-44,
networks/AttResUNet.py:173."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from virnet_tpu.models import build_model
from virnet_tpu.models.dncnn import DnCNN
from virnet_tpu.models.attresunet import AttResUNet


def _params_for(model, x_shape, *extra):
    return model.init(jax.random.PRNGKey(0),
                      jnp.zeros(x_shape), *extra)["params"]


@pytest.mark.parametrize("w", [12, 11])   # even + odd width
def test_dncnn_pair_matches_xla(w):
    x = jnp.asarray(np.random.default_rng(0)
                    .random((2, 9, w, 3)).astype(np.float32))
    ref = DnCNN(out_channels=1, dep=5, num_filters=8)
    par = DnCNN(out_channels=1, dep=5, num_filters=8,
                conv_impl="pair_interpret")
    params = _params_for(ref, (1, 8, 8, 3))
    want = ref.apply({"params": params}, x)
    got = par.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


@pytest.mark.parametrize("dep,avg", [(5, False), (4, True), (2, False)])
def test_dncnn_scan_matches_xla(dep, avg):
    """conv_impl='scan' (mid convs as one lax.scan over stacked weights,
    models/dncnn.py:_scan_stack) shares the param tree with the XLA branch
    and matches it numerically; dep=2 exercises the no-mid-convs edge."""
    x = jnp.asarray(np.random.default_rng(2)
                    .random((2, 9, 12, 3)).astype(np.float32))
    ref = DnCNN(out_channels=1, dep=dep, num_filters=8, noise_avg=avg)
    scn = DnCNN(out_channels=1, dep=dep, num_filters=8, noise_avg=avg,
                conv_impl="scan")
    params = _params_for(ref, (1, 8, 8, 3))
    sparams = _params_for(scn, (1, 8, 8, 3))
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(sparams))
    want = ref.apply({"params": params}, x)
    got = scn.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    # gradients flow through the scanned stack to every layer's params
    def loss(p):
        return jnp.sum(scn.apply({"params": p}, x) ** 2)

    grads = jax.grad(loss)(params)
    for name, g in jax.tree_util.tree_leaves_with_path(grads):
        assert float(jnp.abs(g).max()) > 0.0, name


def test_dncnn_pair_noise_avg_and_3out():
    x = jnp.asarray(np.random.default_rng(1)
                    .random((1, 10, 14, 3)).astype(np.float32))
    ref = DnCNN(out_channels=3, dep=4, num_filters=8, noise_avg=True)
    par = DnCNN(out_channels=3, dep=4, num_filters=8, noise_avg=True,
                conv_impl="pair_interpret")
    params = _params_for(ref, (1, 8, 8, 3))
    np.testing.assert_allclose(
        np.asarray(par.apply({"params": params}, x)),
        np.asarray(ref.apply({"params": params}, x)), atol=3e-5)


def test_attresunet_pair_tail_matches_xla():
    x = jnp.asarray(np.random.default_rng(2)
                    .random((1, 13, 11, 3)).astype(np.float32))
    s = jnp.ones_like(x[..., :1]) * 0.1
    kw = dict(out_chn=3, n_feat=(8, 12), n_resblocks=1, extra_mode="input")
    ref = AttResUNet(**kw)
    par = AttResUNet(**kw, tail_impl="pair_interpret")
    params = _params_for(ref, (1, 8, 8, 3), jnp.zeros((1, 8, 8, 1)))
    want = ref.apply({"params": params}, x, s)
    got = par.apply({"params": params}, x, s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_full_model_pair_matches_xla():
    """Flagship arch end to end (small widths) + param-tree identity."""
    x = jnp.asarray(np.random.default_rng(3)
                    .random((1, 12, 10, 3)).astype(np.float32))
    ref = build_model("denoising-syn", n_feat=(8, 12, 16), dep_S=3,
                      n_resblocks=1, conv_impl="xla")
    par = build_model("denoising-syn", n_feat=(8, 12, 16), dep_S=3,
                      n_resblocks=1, conv_impl="pair_interpret")
    params = _params_for(ref, (1, 8, 8, 3))
    params2 = _params_for(par, (1, 8, 8, 3))
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params2))
    mu_r, sig_r = ref.apply({"params": params}, x)
    mu_p, sig_p = par.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(mu_p), np.asarray(mu_r), atol=3e-5)
    np.testing.assert_allclose(np.asarray(sig_p), np.asarray(sig_r),
                               rtol=2e-4)


@pytest.mark.parametrize("w", [12, 13])
def test_dncnn_fused_whole_stack(w):
    """h chosen so dncnn_pair_fused takes the single-kernel path (h % hbp
    == 0); odd width exercises the in-kernel pad-column re-masking."""
    x = jnp.asarray(np.random.default_rng(7)
                    .random((2, 16, w, 3)).astype(np.float32))
    ref = DnCNN(out_channels=1, dep=5, num_filters=8)
    par = DnCNN(out_channels=1, dep=5, num_filters=8,
                conv_impl="pair_interpret")
    params = _params_for(ref, (1, 8, 8, 3))
    want = ref.apply({"params": params}, x)
    got = par.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_dncnn_fused_dep8_3out():
    """denoising-real SNet shape: dep 8 (6 fused mids, hbp 8), 3 sigma
    channels."""
    x = jnp.asarray(np.random.default_rng(8)
                    .random((1, 16, 10, 3)).astype(np.float32))
    ref = DnCNN(out_channels=3, dep=8, num_filters=8)
    par = DnCNN(out_channels=3, dep=8, num_filters=8,
                conv_impl="pair_interpret")
    params = _params_for(ref, (1, 8, 8, 3))
    np.testing.assert_allclose(
        np.asarray(par.apply({"params": params}, x)),
        np.asarray(ref.apply({"params": params}, x)), atol=5e-5)


def test_trainer_scan_impl_matches_xla(monkeypatch):
    """VIRNET_TPU_SNET_SCAN=1 reaches the TRAINING graph via
    train_conv_impl (train/loop_denoise.py) with the same loss."""
    from virnet_tpu.train.loop_denoise import (DenoiseTrainConfig,
                                               DenoiseTrainer)

    def step_loss():
        cfg = DenoiseTrainConfig(
            sigma_chn=1, dep_S=4, n_feat=(8, 16), n_resblocks=1,
            batch_size=8, patch_size=32, epochs=1, warmup_epochs=1,
            steps_per_epoch=2, save_dir="/tmp/virnet_scan_impl_test")
        tr = DenoiseTrainer(cfg)
        batch = jnp.asarray(np.random.default_rng(3).random(
            (8, 32, 32, 3), dtype=np.float32))
        return float(tr.run_step(batch, epoch=0)["loss"])

    monkeypatch.delenv("VIRNET_TPU_SNET_SCAN", raising=False)
    want = step_loss()
    monkeypatch.setenv("VIRNET_TPU_SNET_SCAN", "1")
    got = step_loss()
    np.testing.assert_allclose(got, want, rtol=1e-5)
