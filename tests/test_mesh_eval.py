"""Mesh-data-parallel evaluation: per-image outputs must be bit-equal to
the single-device path (the VERDICT r3 "executable >=5x" requirement — the
SIDD blocks / Table-5 buckets / demo TTA shard across the data mesh, and
the numbers must not move).

Runs on the 8-device virtual CPU platform (conftest.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from virnet_tpu.eval.engine import Restorer
from virnet_tpu.models import build_model
from virnet_tpu.train.mesh import make_mesh

DENOISE_KW = dict(n_feat=(8, 16), dep_S=3, n_resblocks=1)
SISR_KW = dict(n_feat=(8, 16), dep_S=3, dep_K=2, n_resblocks=1)


def _params(task, kw, sf=None):
    model = build_model(task, **kw)
    args = (jnp.zeros((1, 16, 16, 3)),) + ((sf,) if sf else ())
    return model.init(jax.random.PRNGKey(0), *args)["params"]


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return make_mesh(jax.devices()[:8])


@pytest.fixture(scope="module")
def denoise_pair(mesh):
    params = _params("denoising-syn", DENOISE_KW)
    single = Restorer("denoising-syn", params=params, **DENOISE_KW)
    sharded = Restorer("denoising-syn", params=params, mesh=mesh,
                       **DENOISE_KW)
    return single, sharded


def test_restore_batch_bitwise(denoise_pair):
    single, sharded = denoise_pair
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((16, 24, 24, 3), dtype=np.float32))
    a = np.asarray(single.restore_batch(x))
    b = np.asarray(sharded.restore_batch(x))
    np.testing.assert_array_equal(a, b)


def test_restore_batch_nondivisible(denoise_pair):
    """Batches not divisible by the mesh size are repeat-padded and
    cropped — per-image outputs still bit-equal."""
    single, sharded = denoise_pair
    rng = np.random.default_rng(1)
    for n in (3, 8, 13):
        x = jnp.asarray(rng.random((n, 16, 16, 3), dtype=np.float32))
        a = np.asarray(single.restore_batch(x))
        b = np.asarray(sharded.restore_batch(x))
        assert b.shape[0] == n
        np.testing.assert_array_equal(a, b)


def test_sisr_restore_batch_equivalent(mesh):
    """SISR under sharding: the global sigma/KNet pools compile to a
    different reduction tiling at the per-device shape, so floats agree
    to reduction-order tolerance (measured <=2e-7) rather than bitwise
    (denoising, which has no spatial reductions, IS bitwise above).
    The protocol scores round through uint8 — pinned identical."""
    from virnet_tpu.ops.quant import img_as_ubyte

    params = _params("sisr", SISR_KW, sf=2)
    single = Restorer("sisr", params=params, sf=2, **SISR_KW)
    sharded = Restorer("sisr", params=params, sf=2, mesh=mesh, **SISR_KW)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((8, 12, 12, 3), dtype=np.float32))
    a = np.asarray(single.restore_batch(x))
    b = np.asarray(sharded.restore_batch(x))
    assert a.shape == (8, 24, 24, 3)
    np.testing.assert_allclose(a, b, atol=3e-6, rtol=0)
    np.testing.assert_array_equal(img_as_ubyte(a), img_as_ubyte(b))


def test_eval_sidd_mesh_identical(tmp_path, mesh):
    """eval_sidd (x8 TTA included) through a mesh Restorer produces the
    same per-block outputs and scores as single-device."""
    import scipy.io as sio

    from virnet_tpu.eval.tables import eval_sidd

    rng = np.random.default_rng(3)
    gt = (rng.random((2, 8, 32, 32, 3)) * 255).astype(np.uint8)
    noisy = np.clip(gt.astype(np.int16)
                    + rng.normal(0, 10, gt.shape).astype(np.int16),
                    0, 255).astype(np.uint8)
    noisy_mat = str(tmp_path / "noisy.mat")
    gt_mat = str(tmp_path / "gt.mat")
    sio.savemat(noisy_mat, {"ValidationNoisyBlocksSrgb": noisy})
    sio.savemat(gt_mat, {"ValidationGtBlocksSrgb": gt})

    params = _params("denoising-real",
                     dict(sigma_chn=3, **DENOISE_KW))
    kw = dict(sigma_chn=3, **DENOISE_KW)
    single = Restorer("denoising-real", params=params, **kw)
    sharded = Restorer("denoising-real", params=params, mesh=mesh, **kw)

    res_a = eval_sidd(single, noisy_mat, gt_mat, log_fn=lambda *_: None)
    res_b = eval_sidd(sharded, noisy_mat, gt_mat, log_fn=lambda *_: None)
    np.testing.assert_array_equal(res_a["blocks"], res_b["blocks"])
    assert res_a["psnr"] == res_b["psnr"]
    assert res_a["ssim"] == res_b["ssim"]


def test_eval_sisr_mesh_identical(tmp_path, mesh):
    """Table-5 bucket batches through the mesh: identical scores."""
    import cv2

    from virnet_tpu.eval.tables import eval_sisr_synthetic

    rng = np.random.default_rng(4)
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(2):
        cv2.imwrite(str(d / f"im{i}.png"),
                    (rng.random((28, 24, 3)) * 255).astype(np.uint8))

    params = _params("sisr", SISR_KW, sf=2)
    single = Restorer("sisr", params=params, sf=2, **SISR_KW)
    sharded = Restorer("sisr", params=params, sf=2, mesh=mesh, **SISR_KW)
    dirs = {"tiny": str(d / "*.png")}
    res_a = eval_sisr_synthetic(single, dirs, sf=2, nlevel=2.55,
                                use_lpips=False, log_fn=lambda *_: None)
    res_b = eval_sisr_synthetic(sharded, dirs, sf=2, nlevel=2.55,
                                use_lpips=False, log_fn=lambda *_: None)
    assert res_a["tiny"]["psnr"] == res_b["tiny"]["psnr"]
    assert res_a["tiny"]["ssim"] == res_b["tiny"]["ssim"]
    for ka, kb in zip(res_a["tiny"]["per_kernel"],
                      res_b["tiny"]["per_kernel"]):
        assert ka["psnr"] == kb["psnr"]


def _sequential_tta(restorer, im):
    """The pre-round-4 sequential TTA (8 separate restore_image calls) —
    the reference's loop semantics; kept here as the equality oracle."""
    from virnet_tpu.ops.augment import dihedral_inverse_np, dihedral_np

    outs = [dihedral_inverse_np(
        restorer.restore_image(dihedral_np(im, m)), m) for m in range(8)]
    return np.mean(outs, axis=0).astype(np.float32)


def test_tta_batched_matches_sequential(denoise_pair):
    single, sharded = denoise_pair
    rng = np.random.default_rng(5)
    for shape in ((24, 24, 3), (20, 28, 3)):     # square and rectangular
        im = rng.random(shape).astype(np.float32)
        want = _sequential_tta(single, im)
        got = single.restore_image_tta(im)
        np.testing.assert_array_equal(want, got)
        got_mesh = sharded.restore_image_tta(im)
        np.testing.assert_array_equal(want, got_mesh)


def test_tta_batched_matches_sequential_sisr(mesh):
    from virnet_tpu.ops.quant import img_as_ubyte

    params = _params("sisr", SISR_KW, sf=2)
    single = Restorer("sisr", params=params, sf=2, **SISR_KW)
    sharded = Restorer("sisr", params=params, sf=2, mesh=mesh, **SISR_KW)
    rng = np.random.default_rng(6)
    im = rng.random((14, 18, 3)).astype(np.float32)
    want = _sequential_tta(single, im)
    # single-device batched TTA: bit-equal (same compiled shapes as the
    # sequential batch-4 groups?  no — batch 4 vs 1; pinned bitwise on
    # the denoise model above, but SISR pools re-tile at the batch-4
    # shape, so: reduction-order tolerance + identical uint8)
    got = single.restore_image_tta(im)
    got_mesh = sharded.restore_image_tta(im)
    for g in (got, got_mesh):
        np.testing.assert_allclose(want, g, atol=3e-6, rtol=0)
        np.testing.assert_array_equal(img_as_ubyte(np.clip(want, 0, 1)),
                                      img_as_ubyte(np.clip(g, 0, 1)))


def test_restore_images_matches_per_image(denoise_pair):
    single, sharded = denoise_pair
    rng = np.random.default_rng(7)
    ims = ([rng.random((20, 24, 3)).astype(np.float32) for _ in range(5)]
           + [rng.random((16, 16, 3)).astype(np.float32) for _ in range(3)]
           + [rng.random((20, 24)).astype(np.float32)])     # gray
    want = [single.restore_image(im) for im in ims]
    for r in (single, sharded):
        got = r.restore_images(ims, batch_size=4)
        assert len(got) == len(ims)
        for w, g in zip(want, got):
            np.testing.assert_array_equal(w, g)
