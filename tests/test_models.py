import jax
import jax.numpy as jnp
import numpy as np
import pytest

from virnet_tpu.models import (DnCNN, KernelNet, VIRNet, VIRNetSR,
                               build_model)


def test_dncnn_shapes_and_avg():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((2, 16, 16, 3))
    net = DnCNN(out_channels=1, dep=5)
    params = net.init(key, x)
    out = net.apply(params, x)
    assert out.shape == (2, 16, 16, 1)

    net_avg = DnCNN(out_channels=1, dep=5, noise_avg=True)
    params = net_avg.init(key, x)
    out = net_avg.apply(params, x)
    assert out.shape == (2, 1, 1, 1)


def test_knet_output_ranges():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((2, 32, 32, 3))
    net = KernelNet(num_blocks=2)
    params = net.init(key, x)
    kinfo = net.apply(params, x)
    assert kinfo.shape == (2, 3)
    k = np.asarray(kinfo)
    assert np.all(k[:, :2] >= 1e-4) and np.all(k[:, :2] <= 1e2)
    assert np.all(np.abs(k[:, 2]) <= 1.0)


@pytest.mark.parametrize("extra_mode", ["input", "down", "both", "null"])
def test_virnet_forward_modes(extra_mode):
    key = jax.random.PRNGKey(0)
    x = jnp.ones((1, 20, 24, 3))  # non-multiple of 4 → exercises padding
    net = VIRNet(sigma_chn=1, n_feat=(8, 16, 24), dep_S=3, n_resblocks=1,
                 extra_mode=extra_mode, noise_cond=extra_mode != "null")
    params = net.init(key, x)
    mu, sigma = net.apply(params, x)
    assert mu.shape == x.shape
    assert sigma.shape == (1, 20, 24, 1)
    assert np.all(np.asarray(sigma) > 0)


@pytest.mark.parametrize("sf", [2, 3, 4])
def test_virnetsr_forward(sf):
    key = jax.random.PRNGKey(0)
    x = jnp.ones((1, 16, 20, 3))
    net = VIRNetSR(n_feat=(8, 16, 24), dep_S=3, dep_K=2, n_resblocks=1,
                   extra_mode="both")
    params = net.init(key, x, sf)
    mu, kinfo, sigma = net.apply(params, x, sf)
    assert mu.shape == (1, 16 * sf, 20 * sf, 3)
    assert kinfo.shape == (1, 3)
    assert sigma.shape == (1, 1, 1, 1)


def test_presets_construct():
    key = jax.random.PRNGKey(1)
    x = jnp.ones((1, 32, 32, 3))
    for task in ["denoising-syn", "denoising-real"]:
        net = build_model(task)
        params = net.init(key, x)
        mu, sigma = net.apply(params, x)
        assert mu.shape == x.shape
    net = build_model("sisr")
    params = net.init(key, x, 2)
    mu, kinfo, sigma = net.apply(params, x, 2)
    assert mu.shape == (1, 64, 64, 3)


def test_jit_forward_is_stable():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 32, 32, 3))
    net = VIRNet(sigma_chn=1, n_feat=(8, 16), dep_S=3, n_resblocks=1)
    params = net.init(key, x)
    eager_mu, _ = net.apply(params, x)
    jit_mu, _ = jax.jit(net.apply)(params, x)
    np.testing.assert_allclose(np.asarray(eager_mu), np.asarray(jit_mu),
                               atol=1e-5)


def test_sisr_compact_conditioning_matches_broadcast():
    """VIRNetSR passes (N,1,1,C) conditioning when all maps are per-sample
    constants; gates computed compactly must equal gates computed on the
    explicitly broadcast maps (they are 1x1 convs on constant inputs)."""
    import jax
    import jax.numpy as jnp

    from virnet_tpu.models.attresunet import AttResUNet

    key = jax.random.PRNGKey(7)
    rnet = AttResUNet(out_chn=3, n_feat=(16, 24), n_resblocks=2,
                      extra_mode="both")
    x = jax.random.uniform(key, (2, 24, 24, 3), jnp.float32)
    e_c = jax.random.uniform(key, (2, 1, 1, 4), jnp.float32)
    e_f = jnp.broadcast_to(e_c, (2, 24, 24, 4))
    params = rnet.init(key, x, e_c)["params"]
    y_c = rnet.apply({"params": params}, x, e_c)
    y_f = rnet.apply({"params": params}, x, e_f)
    assert jnp.allclose(y_c, y_f, atol=2e-6, rtol=0)
