"""Converter round trip: import(export(params)) must be the identity."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from virnet_tpu.convert import convert_state_dict
from virnet_tpu.convert.torch_export import export_state_dict
from virnet_tpu.models import VIRNet, VIRNetSR


def _tree_equal(a, b, path=""):
    if isinstance(a, dict):
        assert set(a.keys()) == set(b.keys()), path
        for k in a:
            _tree_equal(a[k], b[k], path + "/" + k)
    else:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0,
                                   err_msg=path)


def test_denoise_roundtrip():
    model = VIRNet(sigma_chn=1, n_feat=(8, 16, 24), dep_S=4, n_resblocks=2,
                   extra_mode="input")
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 16, 16, 3)))["params"]
    sd = export_state_dict(params, model)
    back = convert_state_dict(sd, model)["params"]
    _tree_equal(params, back)


def test_sisr_roundtrip():
    model = VIRNetSR(sigma_chn=1, kernel_chn=3, n_feat=(8, 16), dep_S=3,
                     dep_K=2, n_resblocks=1, extra_mode="both")
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)),
                        2)["params"]
    sd = export_state_dict(params, model)
    back = convert_state_dict(sd, model)["params"]
    _tree_equal(params, back)


def test_pth_save_load(tmp_path):
    from virnet_tpu.convert import load_torch_checkpoint
    from virnet_tpu.convert.torch_export import save_torch_checkpoint

    model = VIRNet(sigma_chn=1, n_feat=(8, 16), dep_S=3, n_resblocks=1,
                   extra_mode="input")
    params = model.init(jax.random.PRNGKey(2),
                        jnp.zeros((1, 8, 8, 3)))["params"]
    path = tmp_path / "export.pth"
    save_torch_checkpoint(path, params, model, epoch=7)
    back = load_torch_checkpoint(path, model)["params"]
    _tree_equal(params, back)


def test_kair_kernel():
    sys.path  # noqa: B018
    from scipy.stats import multivariate_normal

    from virnet_tpu.ops.kernels import kair_anisotropic_gaussian

    k = kair_anisotropic_gaussian(ksize=15, theta=0.7, l1=4.0, l2=2.0)
    assert k.shape == (15, 15)
    assert abs(k.sum() - 1.0) < 1e-12
    # independent check of one off-center value via the same construction
    import math

    v = np.array([[math.cos(0.7), -math.sin(0.7)],
                  [math.sin(0.7), math.cos(0.7)]]) @ np.array([1.0, 0.0])
    vmat = np.array([[v[0], v[1]], [v[1], -v[0]]])
    cov = vmat @ np.diag([4.0, 2.0]) @ np.linalg.inv(vmat)
    center = 15 / 2.0 + 0.5
    y, x = 3, 11
    want = multivariate_normal.pdf([x - center + 1, y - center + 1],
                                   mean=[0, 0], cov=cov)
    raw = k[y, x]
    # reconstruct unnormalized value
    total = sum(
        multivariate_normal.pdf([xx - center + 1, yy - center + 1],
                                mean=[0, 0], cov=cov)
        for yy in range(15) for xx in range(15))
    np.testing.assert_allclose(raw, want / total, rtol=1e-10)
