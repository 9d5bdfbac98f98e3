import numpy as np
import pytest

from virnet_tpu.data.sisr_host import HostSISRSampler, random_qf
from virnet_tpu.data.sources import ImageCache


@pytest.fixture(scope="module")
def cache(tmp_path_factory):
    import cv2

    d = tmp_path_factory.mktemp("hr")
    rng = np.random.default_rng(0)
    for i in range(2):
        cv2.imwrite(str(d / f"im{i}.png"),
                    rng.integers(0, 255, (80, 80, 3), dtype=np.uint8))
    return ImageCache(sorted(str(p) for p in d.glob("*.png")))


def test_host_sampler_gaussian_and_jpeg(cache):
    s = HostSISRSampler(cache, hr_size=48, sf=2, k_size=11, add_jpeg=True,
                        seed=0)
    batch = s.sample(8)
    assert batch.im_hr.shape == (8, 48, 48, 3)
    assert batch.im_lr.shape == (8, 24, 24, 3)
    assert batch.kinfo.shape == (8, 3)
    assert batch.nlevel.shape == (8, 1)
    assert batch.im_lr.min() >= 0 and batch.im_lr.max() <= 1
    # kinfo variances within the sampled λ² range
    assert np.all(batch.kinfo[:, :2] > 0)
    assert np.all(np.abs(batch.kinfo[:, 2]) <= 1.0)


def test_host_sampler_deterministic(cache):
    a = HostSISRSampler(cache, 32, 2, k_size=7, seed=5).sample(4)
    b = HostSISRSampler(cache, 32, 2, k_size=7, seed=5).sample(4)
    np.testing.assert_array_equal(a.im_lr, b.im_lr)
    np.testing.assert_array_equal(a.kinfo, b.kinfo)


def test_random_qf_table():
    rng = np.random.default_rng(0)
    qfs = [random_qf(rng) for _ in range(200)]
    assert min(qfs) >= 30 and max(qfs) <= 95


def test_trainer_host_batches_mode(cache):
    import jax.numpy as jnp

    from virnet_tpu.train.loop_sisr import SISRTrainConfig, SISRTrainer

    cfg = SISRTrainConfig(sigma_chn=1, dep_S=3, dep_K=2, n_feat=(8, 16),
                          n_resblocks=1, extra_mode="both", sf=2, k_size=7,
                          batch_size=8, hr_size=32, epochs=1,
                          steps_per_epoch=2,
                          save_dir="/tmp/test_sisr_host_trainer")
    tr = SISRTrainer(cfg, host_batches=True)
    sampler = HostSISRSampler(cache, 32, 2, k_size=7, add_jpeg=True, seed=1)
    b = sampler.sample(8)
    aux = tr.run_step((jnp.asarray(b.im_hr), jnp.asarray(b.im_lr),
                       jnp.asarray(b.kinfo), jnp.asarray(b.nlevel)),
                      epoch=0)
    assert np.isfinite(float(aux["loss"]))
