"""ops/conv_vjp.py + models/common.FwdDxConv — the forward-style dX path.

Pins (VERDICT r4 item 6 A/B):
  * op level: forward, dX, and dW from conv3x3_same_fwddx are equal to
    jax.grad of the plain conv (HIGHEST precision, fp32 — the custom
    VJP re-expresses the same sums);
  * module level: FwdDxConv declares the identical param tree to
    nn.Conv (names, shapes, AND init draws) so checkpoints interchange,
    and produces identical outputs/grads;
  * trainer level: one real DenoiseTrainer step under
    VIRNET_TPU_DX_IMPL=fwdstyle matches the default step's new params.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from virnet_tpu.models.common import FwdDxConv, conv, resolve_dx_impl
from virnet_tpu.ops.conv_vjp import _conv_same, conv3x3_same_fwddx

P = lax.Precision.HIGHEST


def _rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape,
                             dtype=jnp.float32)


@pytest.mark.parametrize("ci,co", [(5, 7), (8, 8), (3, 16)])
def test_op_level_grads_match_default(ci, co):
    x = _rand(0, (2, 12, 14, ci))
    k = _rand(1, (3, 3, ci, co))
    dy = _rand(2, (2, 12, 14, co))

    def ref(x, k):
        return (_conv_same(x, k, P) * dy).sum()

    def ours(x, k):
        return (conv3x3_same_fwddx(x, k, P) * dy).sum()

    np.testing.assert_array_equal(np.asarray(_conv_same(x, k, P)),
                                  np.asarray(conv3x3_same_fwddx(x, k, P)))
    gref = jax.grad(ref, (0, 1))(x, k)
    gours = jax.grad(ours, (0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gref[0]), np.asarray(gours[0]),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gref[1]), np.asarray(gours[1]),
                               rtol=0, atol=1e-5)


def test_module_param_tree_and_outputs_match_nn_conv():
    key = jax.random.PRNGKey(42)
    x = _rand(3, (2, 16, 16, 6))
    ref_mod = conv(10, 3, 6, name="c")          # nn.Conv (env unset)
    new_mod = FwdDxConv(10, 3, 6, name="c")
    pref = ref_mod.init(key, x)
    pnew = new_mod.init(key, x)
    # identical tree: names, shapes, and the actual init draws
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        pref, pnew)
    np.testing.assert_allclose(np.asarray(ref_mod.apply(pref, x)),
                               np.asarray(new_mod.apply(pref, x)),
                               rtol=0, atol=1e-5)

    def loss(mod, p):
        return (mod.apply(p, x) ** 2).sum()

    gref = jax.grad(lambda p: loss(ref_mod, p))(pref)
    gnew = jax.grad(lambda p: loss(new_mod, p))(pref)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=2e-4), gref, gnew)


def test_env_switch(monkeypatch):
    monkeypatch.delenv("VIRNET_TPU_DX_IMPL", raising=False)
    assert resolve_dx_impl() == "default"
    assert isinstance(conv(8, 3, 8), type(conv(8, 5, 8)))  # both nn.Conv
    monkeypatch.setenv("VIRNET_TPU_DX_IMPL", "fwdstyle")
    assert resolve_dx_impl() == "fwdstyle"
    assert isinstance(conv(8, 3, 8), FwdDxConv)
    # non-qualifying convs keep the default path
    assert not isinstance(conv(8, 5, 8), FwdDxConv)
    assert not isinstance(conv(8, 3, 8, stride=2), FwdDxConv)


def test_trainer_step_equivalent(monkeypatch, tmp_path):
    from virnet_tpu.train.loop_denoise import (DenoiseTrainConfig,
                                               DenoiseTrainer)

    gt = np.asarray(_rand(7, (8, 32, 32, 3))) * 0.5 + 0.5

    def one_step(flag):
        if flag:
            monkeypatch.setenv("VIRNET_TPU_DX_IMPL", "fwdstyle")
        else:
            monkeypatch.delenv("VIRNET_TPU_DX_IMPL", raising=False)
        cfg = DenoiseTrainConfig(
            batch_size=8, patch_size=32, epochs=1, steps_per_epoch=2,
            sigma_chn=1, dep_S=3, n_feat=(8, 16), n_resblocks=1,
            mixed_precision=False,
            save_dir=str(tmp_path / f"dx{flag}"))
        tr = DenoiseTrainer(cfg)
        params, _opt, aux = tr._train_step(tr.params, tr.opt_state,
                                           jnp.asarray(gt),
                                           jax.random.PRNGKey(0))
        return params, aux

    p_ref, aux_ref = one_step(False)
    p_new, aux_new = one_step(True)
    assert np.isfinite(float(aux_new["loss"]))
    np.testing.assert_allclose(float(aux_ref["loss"]),
                               float(aux_new["loss"]), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, dtype=np.float64),
            np.asarray(b, dtype=np.float64), rtol=0, atol=5e-5),
        p_ref, p_new)
