"""Spatially-sharded restoration (eval/spatial.py) vs the whole-image
forward on the virtual 8-device CPU mesh.

The claim under test: with halo >= receptive field, stitching the
per-device strip forwards reproduces the whole-image forward to float
tolerance — including at the true image edges, where SNet's raw-input
zero padding and RNet's reflect pad-to-multiple are both replicated by
the stage-wise window anchoring.  TPU-native analogue of the reference's
recursive 4-quadrant tiling (utils/util_net.py:27-65) for the multi-chip
case.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from virnet_tpu.eval.spatial import plan_strips, restore_rows_sharded
from virnet_tpu.models import VIRNet
from virnet_tpu.train.mesh import make_mesh


def _model_params(n_feat=(8, 16), dep_s=2):
    model = VIRNet(im_chn=3, sigma_chn=1, dep_S=dep_s,
                   n_feat=n_feat, n_resblocks=1, extra_mode="input")
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)))["params"]
    return model, params


def test_plan_strips_covers_and_stays_inside():
    kept, win, starts = plan_strips(256, 8, halo=12, unit=4)
    assert kept * 8 >= 256 and win == kept + 2 * 12
    assert all(0 <= s <= 256 - win for s in starts)
    assert starts[0] == 0 and starts[-1] == 256 - win
    assert all(s % 4 == 0 for s in starts)
    # interior kept rows sit >= halo inside their window
    for i, s in enumerate(starts[1:-1], start=1):
        assert i * kept - s >= 12


def test_plan_strips_rejects_short_images():
    with pytest.raises(ValueError, match="too short"):
        plan_strips(40, 8, halo=32, unit=4)


def test_matches_whole_image_forward():
    model, params = _model_params()
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    # odd size: exercises pad_to_multiple + non-divisible strip overhang
    img = rng.uniform(size=(483, 161, 3)).astype(np.float32)

    ref = np.asarray(model.apply({"params": params},
                                 jnp.asarray(img)[None])[0])[0]
    # halo 24 >> the tiny model's receptive field (~13 rows measured)
    out = restore_rows_sharded(model, params, img, mesh, halo=24)

    assert out.shape == img.shape
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_short_image_falls_back_to_plain_forward():
    model, params = _model_params()
    mesh = make_mesh()
    rng = np.random.default_rng(1)
    img = rng.uniform(size=(40, 64, 3)).astype(np.float32)
    ref = np.asarray(model.apply({"params": params},
                                 jnp.asarray(img)[None])[0])[0]
    out = restore_rows_sharded(model, params, img, mesh, halo=32)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_insufficient_halo_actually_diverges():
    """Sanity that the exactness test is meaningful: halo 0 must NOT
    match (otherwise the assertion above would be vacuous)."""
    model, params = _model_params()
    mesh = make_mesh()
    rng = np.random.default_rng(2)
    img = rng.uniform(size=(483, 161, 3)).astype(np.float32)
    ref = np.asarray(model.apply({"params": params},
                                 jnp.asarray(img)[None])[0])[0]
    out = restore_rows_sharded(model, params, img, mesh, halo=0)
    assert np.abs(out - ref).max() > 1e-4


def test_restorer_sharded_method_matches_restore_image():
    from virnet_tpu.eval.engine import Restorer

    model, params = _model_params()
    r = Restorer("denoising-syn", params=params,
                 n_feat=(8, 16), dep_S=2, n_resblocks=1)
    rng = np.random.default_rng(4)
    im = rng.uniform(size=(483, 161, 3)).astype(np.float32)
    plain = np.clip(r.restore_image(im), 0.0, 1.0)
    sharded = r.restore_image_sharded(im, halo=24)
    np.testing.assert_allclose(sharded, plain, atol=2e-5)


def test_restorer_sharded_method_sisr_route():
    from virnet_tpu.eval.engine import Restorer

    model, params = _sr_model_params()
    r = Restorer("sisr", params=params, sf=2, sigma_chn=1, dep_S=2,
                 dep_K=2, n_feat=(8, 16), n_resblocks=1,
                 extra_mode="both", noise_avg=True)
    rng = np.random.default_rng(7)
    lr = rng.uniform(size=(123, 61, 3)).astype(np.float32)
    plain = np.clip(r.restore_image(lr), 0.0, 1.0)
    sharded = r.restore_image_sharded(lr, halo=24)
    np.testing.assert_allclose(sharded, plain, atol=2e-5)


def _sr_model_params(noise_avg=True):
    from virnet_tpu.models import VIRNetSR

    model = VIRNetSR(im_chn=3, sigma_chn=1, kernel_chn=3, dep_S=2, dep_K=2,
                     n_feat=(8, 16), n_resblocks=1, extra_mode="both",
                     noise_cond=True, kernel_cond=True, noise_avg=noise_avg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 16, 16, 3)), 2)["params"]
    return model, params


@pytest.mark.parametrize("noise_avg", [True, False])
def test_sisr_matches_whole_image_forward(noise_avg):
    from virnet_tpu.eval.spatial import sr_restore_rows_sharded

    model, params = _sr_model_params(noise_avg)
    mesh = make_mesh()
    rng = np.random.default_rng(5)
    lr = rng.uniform(size=(123, 61, 3)).astype(np.float32)

    ref = np.asarray(model.apply({"params": params},
                                 jnp.asarray(lr)[None], 2)[0])[0]
    out = sr_restore_rows_sharded(model, params, lr, sf=2, mesh=mesh,
                                  halo=24)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_sisr_short_image_falls_back():
    from virnet_tpu.eval.spatial import sr_restore_rows_sharded

    model, params = _sr_model_params()
    mesh = make_mesh()
    rng = np.random.default_rng(6)
    lr = rng.uniform(size=(20, 24, 3)).astype(np.float32)
    ref = np.asarray(model.apply({"params": params},
                                 jnp.asarray(lr)[None], 2)[0])[0]
    out = sr_restore_rows_sharded(model, params, lr, sf=2, mesh=mesh,
                                  halo=32)
    np.testing.assert_allclose(out, ref, atol=1e-6)
