"""Batched Table-1/2 harness must score identically to per-image runs."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    import cv2
    import jax
    import jax.numpy as jnp

    from virnet_tpu.eval.engine import Restorer
    from virnet_tpu.models import build_model

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    # three same-shape + one different-shape image
    for i, shape in enumerate([(40, 48, 3)] * 3 + [(48, 40, 3)]):
        cv2.imwrite(str(d / f"im{i}.png"),
                    rng.integers(0, 255, shape, dtype=np.uint8))

    overrides = dict(n_feat=(8, 16), dep_S=3, n_resblocks=1)
    model = build_model("denoising-syn", **overrides)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 16, 16, 3)))["params"]
    restorer = Restorer("denoising-syn", params=params, pad_multiple=8,
                        **overrides)
    return d, restorer


def test_batched_equals_single(setup):
    from virnet_tpu.eval.tables import eval_denoise_synthetic

    d, restorer = setup
    r1 = eval_denoise_synthetic(restorer, {"tiny": str(d)}, "iid",
                                batch_size=1, log_fn=lambda *a: None)
    r4 = eval_denoise_synthetic(restorer, {"tiny": str(d)}, "iid",
                                batch_size=4, log_fn=lambda *a: None)
    for case in r1["tiny"]:
        for name, v in r1["tiny"][case]["psnr_per_image"].items():
            assert abs(v - r4["tiny"][case]["psnr_per_image"][name]) < 1e-9
        assert abs(r1["tiny"][case]["ssim"]
                   - r4["tiny"][case]["ssim"]) < 1e-12


def test_sisr_batched_equals_single(tmp_path):
    """Table-5 shape-batched forwards score identically at any batch size
    (the batching mirrors Table 1/2; reference protocol is one image per
    forward, scripts/sisr_virnet_syn.py:119-156)."""
    import cv2
    import jax
    import jax.numpy as jnp

    from virnet_tpu.eval.engine import Restorer
    from virnet_tpu.eval.tables import eval_sisr_synthetic
    from virnet_tpu.models import build_model

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(1)
    # two LR shapes after modcrop: 3x (40,48) + 1x (48,40)
    for i, shape in enumerate([(80, 96, 3)] * 3 + [(96, 80, 3)]):
        cv2.imwrite(str(d / f"im{i}.png"),
                    rng.integers(0, 255, shape, dtype=np.uint8))

    overrides = dict(n_feat=(8, 16), dep_S=3, dep_K=2, n_resblocks=1)
    model = build_model("sisr", **overrides)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 16, 16, 3)), 2)["params"]
    restorer = Restorer("sisr", params=params, sf=2, pad_multiple=8,
                        **overrides)
    r1 = eval_sisr_synthetic(restorer, {"tiny": str(d)}, sf=2,
                             use_lpips=False, batch_size=1,
                             log_fn=lambda *a: None)
    r4 = eval_sisr_synthetic(restorer, {"tiny": str(d)}, sf=2,
                             use_lpips=False, batch_size=4,
                             log_fn=lambda *a: None)
    for k1, k4 in zip(r1["tiny"]["per_kernel"], r4["tiny"]["per_kernel"]):
        assert abs(k1["psnr"] - k4["psnr"]) < 1e-9
        assert abs(k1["ssim"] - k4["ssim"]) < 1e-12
    assert abs(r1["tiny"]["psnr"] - r4["tiny"]["psnr"]) < 1e-9


def test_remainder_batch_padding_scores_identical(setup):
    """Groups larger than batch_size pad their remainder sub-batch by
    repeating the last image (one compile per group size); scores must
    equal the unbatched run exactly."""
    from virnet_tpu.eval.tables import eval_denoise_synthetic

    d, restorer = setup
    # 3 same-shape images, batch_size=2 -> groups of 2 + remainder 1
    r1 = eval_denoise_synthetic(restorer, {"tiny": str(d)}, "iid",
                                batch_size=1, log_fn=lambda *a: None)
    r2 = eval_denoise_synthetic(restorer, {"tiny": str(d)}, "iid",
                                batch_size=2, log_fn=lambda *a: None)
    for case in r1["tiny"]:
        assert (r1["tiny"][case]["psnr_per_image"]
                == r2["tiny"][case]["psnr_per_image"])
