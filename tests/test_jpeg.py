"""Device-side JPEG degradation (ops/jpeg.py) vs real libjpeg round trips.

The in-graph codec is an explicit float approximation of libjpeg (see the
module docstring), so the parity bar here is closeness, not bitness: it
must capture most of libjpeg's degradation (much closer to the real JPEG
output than the clean input is) and stay within ~1/255 mean abs error.
Reference behavior being modeled: utils/util_image.py:236-257 (cv2
imencode/imdecode), used as a SISR noise type datasets/SISRDatasets.py:
102-114.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from virnet_tpu.ops import jpeg as J
from virnet_tpu.ops.color import imread, jpeg_compress

CBSD = "/root/reference/test_data/CBSD68"


def _natural_image(size=128, idx=0):
    import glob

    paths = sorted(glob.glob(f"{CBSD}/*.png"))
    im = imread(paths[idx], chn="rgb", dtype="float32")
    return im[:size, :size]


def test_quality_tables_match_libjpeg_formula():
    # include qualities where 5000/q is NOT exact (31..49) — libjpeg's
    # integer division must be reproduced, not float division
    for q in [1, 10, 25, 31, 35, 42, 47, 49, 50, 75, 90, 100]:
        luma, chroma = J.quality_tables(float(q))
        scale = 5000 // q if q < 50 else 200 - 2 * q
        exp_luma = np.clip((J._LUMA_Q * scale + 50) // 100, 1, 255)
        exp_chroma = np.clip((J._CHROMA_Q * scale + 50) // 100, 1, 255)
        np.testing.assert_array_equal(np.asarray(luma), exp_luma)
        np.testing.assert_array_equal(np.asarray(chroma), exp_chroma)


def test_flat_image_survives():
    x = jnp.full((32, 32, 3), 0.5)
    out = J.jpeg_degrade(x, 50.0)
    assert out.shape == x.shape
    assert float(jnp.max(jnp.abs(out - x))) < 3.0 / 255.0


@pytest.mark.parametrize("qf", [10, 30, 50, 75, 90])
def test_close_to_libjpeg(qf):
    im = _natural_image()
    real = jpeg_compress(im, qf, chn_in="rgb").astype(np.float32)
    mine = np.asarray(J.jpeg_degrade(im, float(qf)))

    mad_model = np.abs(mine - real).mean()
    mad_clean = np.abs(im - real).mean()
    # captures most of the degradation (measured ratios: 0.02-0.13 for
    # qf<=75, 0.44 at qf=90 where the residual is sub-LSB arithmetic)...
    assert mad_model < 0.55 * mad_clean, (qf, mad_model, mad_clean)
    # ...and is absolutely close to the real round trip
    assert mad_model < 1.5 / 255.0, (qf, mad_model)


def test_per_sample_quality_matches_scalar():
    ims = np.stack([_natural_image(64, 0), _natural_image(64, 1)])
    batched = np.asarray(J.jpeg_degrade(ims, jnp.array([20.0, 80.0])))
    for i, q in enumerate([20.0, 80.0]):
        single = np.asarray(J.jpeg_degrade(ims[i], q))
        np.testing.assert_allclose(batched[i], single, atol=1e-6)


def test_jit_traced_quality_and_odd_shapes():
    im = _natural_image()[:37, :61]  # not multiples of 16

    @jax.jit
    def f(x, q):
        return J.jpeg_degrade(x, q)

    out = np.asarray(f(im, 40.0))
    assert out.shape == im.shape
    eager = np.asarray(J.jpeg_degrade(im, 40.0))
    np.testing.assert_allclose(out, eager, atol=1e-5)


def test_444_mode_more_faithful_to_input():
    im = _natural_image(64)
    sub = np.asarray(J.jpeg_degrade(im, 90.0))
    full = np.asarray(J.jpeg_degrade(im, 90.0, subsample=False))
    assert np.abs(full - im).mean() <= np.abs(sub - im).mean()


def test_random_qf_device_matches_table_support():
    from virnet_tpu.data.sisr_host import random_qf
    from virnet_tpu.data.sisr_synth import random_qf_device

    qf = np.asarray(random_qf_device(jax.random.PRNGKey(0), 4000))
    assert np.all(qf == np.round(qf))
    assert qf.min() >= 30 and qf.max() <= 95
    host = np.array([random_qf(np.random.default_rng(i)) for i in range(500)])
    # same support (the host table can only produce values the device
    # table produces, and vice versa over a large draw)
    assert set(host).issubset(set(qf.astype(int)))


def test_synthesize_sisr_batch_jpeg_branch_jits():
    from virnet_tpu.data.sisr_synth import synthesize_sisr_batch

    hr = jnp.asarray(np.stack([_natural_image(64, i) for i in range(4)]))

    @jax.jit
    def f(key):
        return synthesize_sisr_batch(key, hr, sf=2, k_size=11,
                                     add_jpeg=True)

    b = f(jax.random.PRNGKey(3))
    assert b.im_lr.shape == (4, 32, 32, 3)
    assert np.isfinite(np.asarray(b.im_lr)).all()
    assert float(b.im_lr.min()) >= 0.0 and float(b.im_lr.max()) <= 1.0
    # both noise-type branches appear over keys: JPEG'd samples sit on the
    # uint8 grid, Gaussian ones don't
    on_grid = []
    for s in range(6):
        b = f(jax.random.PRNGKey(s))
        lr = np.asarray(b.im_lr)
        for i in range(lr.shape[0]):
            on_grid.append(np.allclose(lr[i] * 255,
                                       np.round(lr[i] * 255), atol=1e-4))
    assert any(on_grid) and not all(on_grid)


def test_sisr_trainer_jpeg_in_graph_device_data():
    from virnet_tpu.data.device_data import DeviceDataset
    from virnet_tpu.train.loop_sisr import SISRTrainConfig, SISRTrainer
    from virnet_tpu.train.mesh import make_mesh

    mesh = make_mesh()
    cfg = SISRTrainConfig(
        batch_size=8, hr_size=32, sf=2, dep_S=2, dep_K=2,
        n_feat=(8, 16), n_resblocks=1, k_size=11,
        add_jpeg_in_graph=True, mixed_precision=False,
        save_dir="/tmp/virnet_jpeg_ingraph_test")
    tr = SISRTrainer(cfg, mesh=mesh)
    rng = np.random.default_rng(0)
    recs = rng.integers(0, 256, (6, 64, 64, 3), dtype=np.uint8)
    ds = DeviceDataset(mesh, recs)
    aux = tr.run_step_device(ds, epoch=0)
    assert np.isfinite(float(aux["loss"]))
