"""PadOutConv (models/common.py): the narrow-output-conv widening option
must match the plain conv path at identical params (up to conv
accumulation order).

Measured on v5e (BASELINE.md round-2 notes): the widened tail conv does NOT
improve the forward (the conv emitter's epilogue fusions un-fuse and eat
the gain), so pad_narrow defaults to 0; this test keeps the option honest.
"""

import math

import jax
import jax.numpy as jnp
import pytest

from virnet_tpu.models import build_model
from virnet_tpu.models.attresunet import AttResUNet
from virnet_tpu.models.dncnn import DnCNN


@pytest.mark.parametrize("pad", [8, 32])
def test_pad_narrow_matches_plain(pad):
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (2, 48, 48, 3), jnp.float32)

    m_pad = build_model("denoising-syn", pad_narrow=pad)
    params = m_pad.init(key, x)["params"]
    # param tree must be identical to the plain path (checkpoint compat)
    assert params["rnet"]["tail"]["kernel"].shape == (3, 3, 96, 3)
    assert params["snet"]["conv_last"]["kernel"].shape == (3, 3, 64, 1)
    mu_p, sig_p = m_pad.apply({"params": params}, x)

    snet = DnCNN(out_channels=1, dep=5, noise_avg=False, pad_narrow=0)
    rnet = AttResUNet(out_chn=3, n_feat=(96, 192, 288), n_resblocks=3,
                      extra_mode="input", pad_narrow=0)
    sig0 = jnp.exp(jnp.clip(snet.apply({"params": params["snet"]}, x),
                            math.log(1e-10), math.log(1e2)))
    mu0 = rnet.apply({"params": params["rnet"]}, x, jnp.sqrt(sig0))

    # identical math, conv algorithm may reorder accumulation (CPU backend
    # shows ~4e-7; the TPU backend is bit-exact)
    assert jnp.allclose(sig_p, sig0, atol=2e-6, rtol=0)
    assert jnp.allclose(mu_p, mu0, atol=2e-6, rtol=0)


def test_pad_narrow_orthogonal_init_preserved():
    """DnCNN's conv_last keeps its reference init (orthogonal rows would be
    impossible for a (576, 1) kernel — torch orthogonal init degenerates to
    a normalized vector; check zero bias + unchanged shapes instead)."""
    key = jax.random.PRNGKey(3)
    x = jnp.zeros((1, 16, 16, 3))
    p8 = DnCNN(out_channels=1, dep=5, pad_narrow=8).init(key, x)["params"]
    p0 = DnCNN(out_channels=1, dep=5, pad_narrow=0).init(key, x)["params"]
    assert jnp.array_equal(p8["conv_last"]["bias"], p0["conv_last"]["bias"])
    assert p8["conv_last"]["kernel"].shape == p0["conv_last"]["kernel"].shape
    # same initializer distribution family: both orthogonal-with-gain
    assert jnp.allclose(jnp.linalg.norm(p8["conv_last"]["kernel"]),
                        jnp.linalg.norm(p0["conv_last"]["kernel"]), rtol=0.3)
