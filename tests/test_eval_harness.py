import numpy as np
import jax.numpy as jnp
import pytest

from virnet_tpu.eval import metrics as M
from virnet_tpu.eval.tiling import bucket_size, forward_chop, padded_forward
from virnet_tpu.eval.tta import tta_x8
from virnet_tpu.ops.augment import dihedral, dihedral_inverse


def test_psnr_known_value():
    a = np.zeros((16, 16, 3), dtype=np.uint8)
    b = np.full((16, 16, 3), 10, dtype=np.uint8)
    got = M.calculate_psnr(a, b)
    want = 20 * np.log10(255.0 / 10.0)
    np.testing.assert_allclose(got, want, rtol=1e-9)
    assert M.calculate_psnr(a, a) == float("inf")


def test_ssim_identity_is_one():
    rng = np.random.default_rng(0)
    im = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    assert abs(M.calculate_ssim(im, im) - 1.0) < 1e-9


def test_batch_metrics_uint8_roundtrip():
    rng = np.random.default_rng(1)
    gt = rng.random((2, 24, 24, 3)).astype(np.float32)
    # noise below half a quantization level vanishes after uint8 round-trip
    noisy = gt + 1e-4
    assert M.batch_psnr(noisy, gt) > 50


def test_tta_x8_equals_sequential():
    # a non-symmetric "restorer": shift-variant linear fn
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.random((8, 8, 1)).astype(np.float32))

    def forward(x):
        return x * w + 0.1 * jnp.flip(x, axis=-3)

    x = jnp.asarray(rng.random((2, 8, 8, 1)).astype(np.float32))
    got = tta_x8(forward, x)

    acc = jnp.zeros_like(x)
    for m in range(8):
        acc = acc + dihedral_inverse(forward(dihedral(x, m)), m)
    want = acc / 8
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_forward_chop_identity_function():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((1, 40, 48, 3)).astype(np.float32))
    out = forward_chop(lambda t: t, x, sf=1, shave=4, min_size=10000)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-7)


def test_forward_chop_upscale():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.random((1, 20, 24, 3)).astype(np.float32))

    def up2(t):
        t = jnp.repeat(t, 2, axis=-3)
        return jnp.repeat(t, 2, axis=-2)

    out = forward_chop(up2, x, sf=2, shave=2, min_size=10000)
    np.testing.assert_allclose(np.asarray(out), np.asarray(up2(x)), atol=1e-7)


def test_bucket_and_padded_forward():
    assert bucket_size(100, 64) == 128
    assert bucket_size(64, 64) == 64
    assert bucket_size(5, buckets=[8, 16]) == 8
    x = jnp.ones((1, 33, 41, 3))
    out = padded_forward(lambda t: t * 2, x, multiple=16)
    assert out.shape == (1, 33, 41, 3)
    np.testing.assert_allclose(np.asarray(out), 2.0)


def test_dnd_bundler(tmp_path):
    import scipy.io as sio

    from virnet_tpu.eval.dnd import bundle_submissions_srgb

    rng = np.random.default_rng(5)
    for i in range(50):
        for k in range(20):
            sio.savemat(str(tmp_path / f"{i + 1:04d}_{k + 1:02d}.mat"),
                        {"Idenoised_crop":
                         rng.random((4, 4, 3)).astype(np.float32)})
    bundle_submissions_srgb(tmp_path)
    bundled = sio.loadmat(str(tmp_path / "bundled" / "0001.mat"))
    assert bundled["Idenoised"].shape == (1, 20)
    assert not bool(bundled["israw"][0])


def test_mixup_shapes_and_range():
    import jax

    from virnet_tpu.data.mixup import mixup_pairs

    key = jax.random.PRNGKey(0)
    gt = jnp.zeros((8, 4, 4, 3))
    noisy = jnp.ones((8, 4, 4, 3))
    g2, n2 = mixup_pairs(key, gt, noisy)
    assert g2.shape == gt.shape
    # blending identical-pair structure: gt stays 0 mix of 0s, noisy stays 1
    np.testing.assert_allclose(np.asarray(g2), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(n2), 1.0, atol=1e-7)


def test_config_loader():
    from virnet_tpu.config import as_bool, loads_commented_json

    cfg = loads_commented_json(
        '{\n  # comment line\n  "a": 1,  # trailing\n  "b": "True",\n'
        '  "c": [1, 2]  // other comment\n}')
    assert cfg == {"a": 1, "b": "True", "c": [1, 2]}
    assert as_bool("True") and not as_bool("False")
    assert as_bool(True)
    with pytest.raises(ValueError):
        as_bool("maybe")
