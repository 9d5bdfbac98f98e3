"""Bit-level parity of SISRValSet / DenoiseValSet against the reference's
actual dataset classes executed from /root/reference."""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference tree not mounted")


@pytest.fixture(scope="module")
def ref_datasets():
    from virnet_tpu.ops.quant import (img_as_float32, img_as_float64,
                                      img_as_ubyte)

    shims = {}
    skimage = types.ModuleType("skimage")
    skimage.img_as_float32 = img_as_float32
    skimage.img_as_float64 = img_as_float64
    skimage.img_as_ubyte = img_as_ubyte
    skimage.img_as_float = img_as_float64
    shims["skimage"] = skimage
    for name in ("lmdb", "lpips", "thop", "h5py"):
        shims[name] = types.ModuleType(name)
    shims["lmdb"].open = None
    shims["h5py"].File = None

    saved = {k: sys.modules.get(k) for k in shims}
    sys.modules.update(shims)
    sys.path.insert(0, str(REF))
    try:
        import datasets.SISRDatasets as ref_sisr
        import datasets.DenoisingDatasets as ref_dn
        yield dict(sisr=ref_sisr, dn=ref_dn)
    finally:
        sys.path.remove(str(REF))
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


@pytest.fixture(scope="module")
def bmp_dir(tmp_path_factory):
    import cv2

    d = tmp_path_factory.mktemp("hr_bmp")
    rng = np.random.default_rng(0)
    for i, shape in enumerate([(64, 72, 3), (80, 60, 3)]):
        cv2.imwrite(str(d / f"im{i}.bmp"),
                    rng.integers(0, 255, shape, dtype=np.uint8))
    return d


@pytest.mark.parametrize("noise_type", ["Gaussian", "JPEG"])
@pytest.mark.parametrize("downsampler", ["bicubic", "direct"])
def test_sisr_valset_bitexact(ref_datasets, bmp_dir, noise_type,
                              downsampler):
    from virnet_tpu.data.eval_sets import SISRValSet

    ours = SISRValSet(sorted(str(p) for p in bmp_dir.glob("*.bmp")), sf=2,
                      downsampler=downsampler, noise_type=noise_type)
    theirs = ref_datasets["sisr"].GeneralTest(
        str(bmp_dir), sf=2, kernel_shift=False, downsampler=downsampler,
        noise_type=noise_type)
    assert len(ours) == len(theirs)
    for i in range(len(ours)):
        hr_o, lr_o, kinfo_o = ours[i]
        hr_t, lr_t, kinfo_t = theirs[i]
        np.testing.assert_array_equal(hr_o, hr_t.numpy().transpose(1, 2, 0))
        np.testing.assert_allclose(lr_o, lr_t.numpy().transpose(1, 2, 0),
                                   atol=1e-7)
        np.testing.assert_allclose(kinfo_o, kinfo_t.numpy(), atol=1e-12)


def test_denoise_valset_bitexact(ref_datasets, tmp_path):
    import cv2

    from virnet_tpu.data.eval_sets import DenoiseValSet

    rng = np.random.default_rng(1)
    paths = []
    for i, shape in enumerate([(48, 56, 3), (64, 48, 3)]):
        p = tmp_path / f"v{i}.png"
        cv2.imwrite(str(p), rng.integers(0, 255, shape, dtype=np.uint8))
        paths.append(str(p))

    ours = DenoiseValSet(paths)
    theirs = ref_datasets["dn"].SimulateTest(paths)
    for i in range(len(paths)):
        noisy_o, gt_o = ours[i]
        noisy_t, gt_t = theirs[i]
        np.testing.assert_array_equal(gt_o, gt_t.numpy().transpose(1, 2, 0))
        np.testing.assert_allclose(noisy_o,
                                   noisy_t.numpy().transpose(1, 2, 0),
                                   atol=1e-7)
