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
