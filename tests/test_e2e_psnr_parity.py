"""End-to-end PSNR parity (the ±0.01 dB target): our full eval pipeline
(Restorer + DenoiseBenchmark + metrics) vs the reference benchmark-script
logic executed with the reference's own torch model — same weights, same
seeds, same images."""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference tree not mounted")


def test_table2_psnr_parity(tmp_path):
    import cv2
    import jax
    import jax.numpy as jnp
    import torch

    from virnet_tpu.convert.torch_export import export_state_dict
    from virnet_tpu.data.eval_sets import DenoiseBenchmark
    from virnet_tpu.eval.engine import Restorer
    from virnet_tpu.eval.metrics import calculate_psnr, calculate_ssim
    from virnet_tpu.models import VIRNet
    from virnet_tpu.ops.quant import img_as_float32, img_as_ubyte

    # small arch (same semantics) to keep CPU runtime sane
    arch = dict(sigma_chn=1, n_feat=(16, 24, 32), dep_S=3, n_resblocks=1,
                extra_mode="input")
    model = VIRNet(**arch)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 16, 16, 3)))["params"]

    # reference torch model with the same weights
    thop = types.ModuleType("thop")
    thop.profile = None
    saved = sys.modules.get("thop")
    sys.modules["thop"] = thop
    sys.path.insert(0, str(REF))
    try:
        from networks.VIRNet import VIRAttResUNet
    finally:
        sys.path.remove(str(REF))
        if saved is None:
            sys.modules.pop("thop", None)
        else:
            sys.modules["thop"] = saved
    ref_net = VIRAttResUNet(im_chn=3, sigma_chn=1, n_feat=[16, 24, 32],
                            dep_S=3, n_resblocks=1, noise_cond=True,
                            extra_mode="Input", noise_avg=False)
    sd = {k: torch.from_numpy(np.asarray(v, dtype=np.float32))
          for k, v in export_state_dict(params, model).items()}
    ref_net.load_state_dict(sd, strict=True)
    ref_net.eval()

    # two small eval images
    rng = np.random.default_rng(7)
    im_paths = []
    for i in range(2):
        p = tmp_path / f"im{i}.png"
        cv2.imwrite(str(p), rng.integers(0, 255, (96 + 32 * i, 112, 3),
                                         dtype=np.uint8))
        im_paths.append(str(p))

    restorer = Restorer("denoising-syn", params=params, pad_multiple=4,
                        **arch)

    # our side and the reference-script side must consume the SAME rng
    # stream, so run case-by-case with twin benchmarks
    ours = DenoiseBenchmark("iid", seed=1000)
    theirs = DenoiseBenchmark("iid", seed=1000)

    for (case, base), (_, base2) in zip(ours.cases(), theirs.cases()):
        for p in im_paths:
            im_gt = cv2.cvtColor(cv2.imread(str(p)), cv2.COLOR_BGR2RGB)

            # ---- our pipeline
            im_noisy = ours.noisy(im_gt, base)
            out = restorer.restore_image(im_noisy)
            im_dn = img_as_ubyte(np.clip(out, 0, 1))
            psnr_ours = calculate_psnr(im_dn, im_gt)
            ssim_ours = calculate_ssim(im_dn, im_gt)

            # ---- reference script logic (scripts/denoising_virnet_syn.py)
            im_noisy2 = theirs.noisy(im_gt, base2)
            inputs = torch.from_numpy(
                im_noisy2.transpose(2, 0, 1)[None]).float()
            with torch.no_grad():
                mu, _ = ref_net(inputs)
            out_t = mu.squeeze(0).numpy().transpose(1, 2, 0)
            im_dn_t = img_as_ubyte(np.clip(out_t, 0.0, 1.0))
            psnr_ref = calculate_psnr(im_dn_t, im_gt)
            ssim_ref = calculate_ssim(im_dn_t, im_gt)

            assert abs(psnr_ours - psnr_ref) <= 0.01, (
                case, p, psnr_ours, psnr_ref)
            assert abs(ssim_ours - ssim_ref) <= 1e-4, (
                case, p, ssim_ours, ssim_ref)
