"""Device-resident dataset sampling (data/device_data.py): the TPU-native
replacement for host-side crop/augment DataLoader workers
(datasets/DenoisingDatasets.py:73-99)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from virnet_tpu.data.device_data import (DeviceDataset, dihedral_traced,
                                         sample_patches)
from virnet_tpu.ops.augment import dihedral
from virnet_tpu.train.mesh import make_mesh


def _records(n=6, size=32, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n, size, size, c), dtype=np.uint8)


@pytest.mark.parametrize("mode", range(8))
def test_dihedral_traced_matches_static(mode):
    x = jnp.asarray(_records(1, 16)[0].astype(np.float32))
    got = dihedral_traced(x, jnp.int32(mode))
    want = dihedral(x[None], mode)[0]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sample_patches_shapes_and_determinism():
    recs = jnp.asarray(_records())
    key = jax.random.PRNGKey(0)
    a = sample_patches(key, recs, batch=8, patch=16)
    b = sample_patches(key, recs, batch=8, patch=16)
    assert a.shape == (8, 16, 16, 3) and a.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = sample_patches(jax.random.PRNGKey(1), recs, batch=8, patch=16)
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_paired_sampling_uses_identical_randomness():
    recs = jnp.asarray(_records())
    n, g = sample_patches(jax.random.PRNGKey(3), recs, batch=8, patch=16,
                          extra=recs)
    np.testing.assert_array_equal(np.asarray(n), np.asarray(g))


def test_crops_are_genuine_windows():
    # patch == record size, no augment: crops must equal whole records
    recs = jnp.asarray(_records(4, 16))
    out = sample_patches(jax.random.PRNGKey(5), recs, batch=16, patch=16,
                         augment=False)
    src = np.asarray(recs)
    for patch_img in np.asarray(out):
        assert any(np.array_equal(patch_img, src[i]) for i in range(4))


def test_device_dataset_trainer_step_and_reproducibility():
    from virnet_tpu.train.loop_denoise import (DenoiseTrainConfig,
                                               DenoiseTrainer)

    mesh = make_mesh()
    recs = _records(10, 48)
    noisy = np.clip(recs.astype(np.int16) + 5, 0, 255).astype(np.uint8)

    def run():
        cfg = DenoiseTrainConfig(
            batch_size=8, patch_size=32, dep_S=3, n_feat=(8, 16),
            n_resblocks=1, mixed_precision=False,
            save_dir="/tmp/virnet_devdata_test")
        tr = DenoiseTrainer(cfg, real=True, mesh=mesh)
        ds = DeviceDataset(mesh, noisy, recs)
        for _ in range(3):
            aux = tr.run_step_device(ds, epoch=0)
        assert np.isfinite(float(aux["loss"]))
        return tr.params

    p1, p2 = run(), run()
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_device_dataset_syn_branch():
    """Unpaired records → the synthetic-noise step (on-device synthesis)."""
    from virnet_tpu.train.loop_denoise import (DenoiseTrainConfig,
                                               DenoiseTrainer)

    mesh = make_mesh()
    cfg = DenoiseTrainConfig(
        batch_size=8, patch_size=32, dep_S=3, n_feat=(8, 16),
        n_resblocks=1, mixed_precision=False,
        save_dir="/tmp/virnet_devdata_syn_test")
    tr = DenoiseTrainer(cfg, mesh=mesh)
    ds = DeviceDataset(mesh, _records(6, 48))
    aux = tr.run_step_device(ds, epoch=0)
    assert np.isfinite(float(aux["loss"]))


def test_device_dataset_sisr_trainer():
    from virnet_tpu.train.loop_sisr import SISRTrainConfig, SISRTrainer

    mesh = make_mesh()
    cfg = SISRTrainConfig(
        batch_size=8, hr_size=32, sf=2, dep_S=2, dep_K=2,
        n_feat=(8, 16), n_resblocks=1, k_size=11,
        mixed_precision=False, save_dir="/tmp/virnet_devdata_sisr_test")
    tr = SISRTrainer(cfg, mesh=mesh)
    ds = DeviceDataset(mesh, _records(6, 64))
    aux = tr.run_step_device(ds, epoch=0)
    assert np.isfinite(float(aux["loss"]))


def test_records_from_images(tmp_path):
    import cv2

    for i, size in enumerate([(40, 50), (20, 20)]):   # second needs padding
        im = np.full((*size, 3), i * 40 + 10, np.uint8)
        cv2.imwrite(str(tmp_path / f"im{i}.png"), im)
    from virnet_tpu.data.device_data import records_from_images
    recs = records_from_images(sorted(tmp_path.glob("*.png")), 32,
                               per_image=3)
    assert recs.shape == (6, 32, 32, 3) and recs.dtype == np.uint8
    # constant images survive crop+pad as constants
    assert set(np.unique(recs)) <= {10, 50}


def test_refresh_guards_shape():
    mesh = make_mesh()
    ds = DeviceDataset(mesh, _records(4, 16))
    with pytest.raises(ValueError, match="shape"):
        ds.refresh(_records(5, 16))
    ds.refresh(_records(4, 16, seed=9))   # same shape ok
