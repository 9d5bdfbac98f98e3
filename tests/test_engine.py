"""Restorer engine: pad-bucket, chop, gray handling — with a tiny model."""

import numpy as np
import pytest

import virnet_tpu.eval.engine as engine_mod
from virnet_tpu.eval.engine import Restorer
from virnet_tpu.models import ARCH_PRESETS


@pytest.fixture(scope="module")
def tiny_restorer():
    # shrink the preset so CPU tests stay fast; params built fresh
    import jax

    from virnet_tpu.models import build_model

    overrides = dict(n_feat=(8, 16), dep_S=3, n_resblocks=1)
    model = build_model("denoising-syn", **overrides)
    import jax.numpy as jnp
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 16, 16, 3)))["params"]
    return Restorer("denoising-syn", params=params, pad_multiple=16,
                    **overrides)


def test_restore_image_arbitrary_size(tiny_restorer):
    rng = np.random.default_rng(0)
    im = rng.random((37, 53, 3)).astype(np.float32)
    out = tiny_restorer.restore_image(im)
    assert out.shape == (37, 53, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_restore_gray_image(tiny_restorer):
    # reference parity: gray inputs come back as the 3-channel restoration
    # (scripts/testing_demo.py:83-97); gray_mean=True opts into averaging
    rng = np.random.default_rng(1)
    im = rng.random((20, 24)).astype(np.float32)
    out = tiny_restorer.restore_image(im)
    assert out.shape == (20, 24, 3)
    tiny_restorer.gray_mean = True
    out = tiny_restorer.restore_image(im)
    assert out.shape == (20, 24)
    tiny_restorer.gray_mean = False


def test_restore_large_image_uses_chop(tiny_restorer, monkeypatch):
    # drop the threshold so a small image exercises the chop path.
    # (Chop output differs from whole-image output near tile seams by
    # construction — tiles see reflect padding at fake boundaries, exactly
    # like the reference's forward_chop — so this checks structure, and
    # exact stitching correctness is covered by the linear-function tests
    # in test_eval_harness.py.)
    monkeypatch.setattr(engine_mod, "CHOP_THRESHOLD", 512)
    rng = np.random.default_rng(2)
    im = rng.random((48, 64, 3)).astype(np.float32)
    out_chop = tiny_restorer.restore_image(im)
    assert out_chop.shape == im.shape
    assert np.all(np.isfinite(out_chop))
    assert out_chop.min() >= 0.0 and out_chop.max() <= 1.0


def test_sisr_restorer_scales():
    import jax
    import jax.numpy as jnp

    from virnet_tpu.models import build_model

    overrides = dict(n_feat=(8, 16), dep_S=3, dep_K=2, n_resblocks=1)
    model = build_model("sisr", **overrides)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
                        2)["params"]
    r = Restorer("sisr", params=params, sf=2, pad_multiple=8, **overrides)
    im = np.random.default_rng(3).random((21, 17, 3)).astype(np.float32)
    out = r.restore_image(im)
    assert out.shape == (42, 34, 3)


def test_restorer_loads_orbax_run_dir(tmp_path):
    import jax
    import jax.numpy as jnp

    from virnet_tpu.models import build_model
    from virnet_tpu.train.checkpoint import CheckpointManager

    overrides = dict(n_feat=(8, 16), dep_S=3, n_resblocks=1)
    model = build_model("denoising-syn", **overrides)
    params = model.init(jax.random.PRNGKey(3),
                        jnp.zeros((1, 8, 8, 3)))["params"]
    mngr = CheckpointManager(tmp_path)
    mngr.save(5, dict(params=params, step=5, epoch=1))

    r = Restorer("denoising-syn", ckpt_path=str(tmp_path), pad_multiple=8,
                 **overrides)
    out = r.restore_image(np.ones((16, 16, 3), dtype=np.float32) * 0.5)
    assert out.shape == (16, 16, 3)
    # same weights -> same output as direct params
    r2 = Restorer("denoising-syn", params=params, pad_multiple=8,
                  **overrides)
    out2 = r2.restore_image(np.ones((16, 16, 3), dtype=np.float32) * 0.5)
    np.testing.assert_allclose(out, out2, atol=1e-6)


def test_restore_image_tta_shape(tiny_restorer):
    rng = np.random.default_rng(5)
    im = rng.random((24, 24, 3)).astype(np.float32)
    out = tiny_restorer.restore_image_tta(im)
    assert out.shape == (24, 24, 3)
    assert np.all(np.isfinite(out))


def test_restore_exact_bucket_no_pad(tiny_restorer):
    rng = np.random.default_rng(6)
    im = rng.random((32, 32, 3)).astype(np.float32)   # multiple of 16
    out = tiny_restorer.restore_image(im)
    assert out.shape == (32, 32, 3)


def test_default_exact_mode_matches_raw_forward():
    """Default pad_multiple=0: restore_image must equal the raw-input
    forward (the reference's semantics — model pads internally).  With
    bucketing the SISR global pools see padded content; measured
    +0.014 dB PSNR-Y drift at a non-bucket LR shape, above the parity
    bar, so exact is the default.  Regression for that."""
    import jax
    import jax.numpy as jnp

    from virnet_tpu.models import build_model

    for task, kw in [("denoising-syn", {}), ("sisr", dict(sf=2))]:
        overrides = dict(n_feat=(8, 16), dep_S=2, n_resblocks=1)
        if task == "sisr":
            overrides["dep_K"] = 2
        model = build_model(task, **overrides)
        init_args = (jnp.zeros((1, 16, 16, 3)),) + \
            ((2,) if task == "sisr" else ())
        params = model.init(jax.random.PRNGKey(0), *init_args)["params"]
        r = Restorer(task, params=params, **kw, **overrides)
        assert r.pad_multiple == 0
        rng = np.random.default_rng(3)
        im = rng.random((37, 53, 3)).astype(np.float32)  # not mult of 64
        out = r.restore_image(im)
        sf = r.sf
        raw = np.asarray(r.restore_batch(jnp.asarray(im[None]))[0])
        np.testing.assert_allclose(out, raw[:37 * sf, :53 * sf], atol=1e-6)


def test_compute_bf16_mode():
    """Restorer(compute='bf16') — the deployment fast path — returns
    fp32 output close to the fp32-exact forward on trained demo weights
    (random-weight nets amplify dtype noise chaotically, so use the
    bundled checkpoint), and rejects unknown modes."""
    from pathlib import Path

    ckpt = Path("model_zoo/virnet_denoising_syn_demo.pth")
    if not ckpt.exists():
        pytest.skip("demo checkpoint not bundled")
    r32 = Restorer("denoising-syn", ckpt_path=str(ckpt))
    r16 = Restorer("denoising-syn", ckpt_path=str(ckpt), compute="bf16")
    rng = np.random.default_rng(5)
    im = np.clip(rng.random((96, 80, 3)) + rng.normal(0, 0.05, (96, 80, 3)),
                 0, 1).astype(np.float32)
    a = r32.restore_image(im)
    b = r16.restore_image(im)
    assert b.dtype == np.float32
    # agreement: bf16 has ~3 decimal digits; restored images should agree
    # to ~1% absolute everywhere
    assert float(np.abs(a - b).max()) < 0.02, float(np.abs(a - b).max())

    with pytest.raises(ValueError):
        Restorer("denoising-syn", ckpt_path=str(ckpt), compute="fp16")
