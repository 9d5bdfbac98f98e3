"""Native packed-dataset tests (skipped cleanly if no C++ toolchain)."""

import shutil

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")


def test_roundtrip_and_sample(tmp_path):
    from virnet_tpu.data.packdb import PackDBSampler, write_packdb

    rng = np.random.default_rng(0)
    noisy = rng.integers(0, 255, (5, 40, 40, 3), dtype=np.uint8)
    gt = rng.integers(0, 255, (5, 40, 40, 3), dtype=np.uint8)
    path = tmp_path / "test.vpk"
    write_packdb(path, noisy, gt)

    s = PackDBSampler(path, patch_size=16, seed=7)
    assert len(s) == 5
    a, b = s.sample(32)
    assert a.shape == (32, 16, 16, 3) and b.shape == (32, 16, 16, 3)
    assert a.dtype == np.float32
    assert 0.0 <= a.min() and a.max() <= 1.0
    s.close()


def test_determinism_and_reseed(tmp_path):
    from virnet_tpu.data.packdb import PackDBSampler, write_packdb

    rng = np.random.default_rng(1)
    noisy = rng.integers(0, 255, (3, 32, 32, 3), dtype=np.uint8)
    path = tmp_path / "single.vpk"
    write_packdb(path, noisy)        # unpaired

    s1 = PackDBSampler(path, patch_size=8, seed=3)
    s2 = PackDBSampler(path, patch_size=8, seed=3)
    a1 = s1.sample(16)
    a2 = s2.sample(16)
    np.testing.assert_array_equal(a1, a2)
    a3 = s1.sample(16)               # counter advanced → differs
    assert not np.array_equal(a1, a3)
    s1.reset_seed(3)
    np.testing.assert_array_equal(s1.sample(16), a1)
    s1.close()
    s2.close()


def test_patches_come_from_source(tmp_path):
    """Every sampled patch must be an exact crop+dihedral of some record."""
    from virnet_tpu.data.packdb import PackDBSampler, write_packdb
    from virnet_tpu.ops.augment import dihedral_np

    rng = np.random.default_rng(2)
    rec = rng.integers(0, 255, (1, 12, 12, 3), dtype=np.uint8)
    path = tmp_path / "one.vpk"
    write_packdb(path, rec)
    s = PackDBSampler(path, patch_size=6, seed=11)
    patches = (s.sample(40) * 255).astype(np.uint8)
    src = rec[0]
    # enumerate all crops x modes and check membership
    candidates = set()
    for i0 in range(7):
        for j0 in range(7):
            crop = src[i0:i0 + 6, j0:j0 + 6]
            for m in range(8):
                candidates.add(dihedral_np(crop, m).tobytes())
    for p in patches:
        assert p.tobytes() in candidates
    s.close()


def test_pack_from_folders(tmp_path):
    import cv2

    from virnet_tpu.data.packdb import PackDBSampler, pack_from_folders

    root = tmp_path / "patches"
    (root / "noisy").mkdir(parents=True)
    (root / "gt").mkdir()
    rng = np.random.default_rng(3)
    for i in range(3):
        cv2.imwrite(str(root / "noisy" / f"sidd_{i}.png"),
                    rng.integers(0, 255, (24, 24, 3), dtype=np.uint8))
        cv2.imwrite(str(root / "gt" / f"sidd_{i}.png"),
                    rng.integers(0, 255, (24, 24, 3), dtype=np.uint8))
    out = tmp_path / "pack.vpk"
    n = pack_from_folders(root / "noisy", out)
    assert n == 3
    s = PackDBSampler(out, patch_size=12, seed=0)
    a, b = s.sample(8)
    assert a.shape == (8, 12, 12, 3) and b.shape == (8, 12, 12, 3)
    s.close()


def test_uint8_batch_matches_float_batch_loss():
    """Trainers normalize uint8 batches in-graph; the loss must equal the
    host-normalized float path bit-for-bit."""
    import jax
    import jax.numpy as jnp

    from virnet_tpu.train.loop_denoise import (DenoiseTrainConfig,
                                               DenoiseTrainer)

    cfg = DenoiseTrainConfig(batch_size=8, patch_size=32, dep_S=2,
                             n_feat=(8, 12), n_resblocks=1,
                             mixed_precision=False,
                             save_dir="/tmp/vt_u8_test")
    tr = DenoiseTrainer(cfg, real=True)
    rng = np.random.default_rng(0)
    noisy_u8 = rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)
    gt_u8 = rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)
    key = jax.random.PRNGKey(0)

    p0, o0 = tr.params, tr.opt_state
    p_u8, _, aux_u8 = tr._train_step(
        jax.tree_util.tree_map(jnp.copy, p0),
        jax.tree_util.tree_map(jnp.copy, o0), (noisy_u8, gt_u8), key)
    p_f, _, aux_f = tr._train_step(
        jax.tree_util.tree_map(jnp.copy, p0),
        jax.tree_util.tree_map(jnp.copy, o0),
        (noisy_u8.astype(np.float32) / 255.0,
         gt_u8.astype(np.float32) / 255.0), key)
    assert np.allclose(float(aux_u8["loss"]), float(aux_f["loss"]),
                       rtol=1e-6)
    flat_u8 = jax.tree_util.tree_leaves(p_u8)
    flat_f = jax.tree_util.tree_leaves(p_f)
    for a, b in zip(flat_u8, flat_f):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)
