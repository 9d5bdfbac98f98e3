"""Forward parity against the reference's ACTUAL torch model classes.

We export random flax params to a .pth-format state dict, load it into the
reference's VIRAttResUNet / VIRAttResUNetSR (imported from /root/reference,
with a thop shim), and compare forwards.  This validates the converter's
name map and every op-semantics choice against the real reference code —
not a re-implementation of it."""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference tree not mounted")


@pytest.fixture(scope="module")
def ref_networks():
    import torch  # noqa: F401

    thop = types.ModuleType("thop")
    thop.profile = None
    saved = sys.modules.get("thop")
    sys.modules["thop"] = thop
    sys.path.insert(0, str(REF))
    try:
        from networks.VIRNet import VIRAttResUNet, VIRAttResUNetSR
        yield dict(VIRAttResUNet=VIRAttResUNet,
                   VIRAttResUNetSR=VIRAttResUNetSR)
    finally:
        sys.path.remove(str(REF))
        if saved is None:
            sys.modules.pop("thop", None)
        else:
            sys.modules["thop"] = saved


def test_denoise_forward_matches_reference_model(ref_networks):
    import jax
    import jax.numpy as jnp
    import torch

    from virnet_tpu.convert.torch_export import export_state_dict
    from virnet_tpu.models import VIRNet

    n_feat, dep_s, n_res, sigma_chn = (16, 24, 32), 4, 2, 1
    model = VIRNet(sigma_chn=sigma_chn, n_feat=n_feat, dep_S=dep_s,
                   n_resblocks=n_res, extra_mode="input")
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 16, 16, 3)))["params"]

    ref = ref_networks["VIRAttResUNet"](
        im_chn=3, sigma_chn=sigma_chn, n_feat=list(n_feat), dep_S=dep_s,
        n_resblocks=n_res, noise_cond=True, extra_mode="Input",
        noise_avg=False)
    sd = {k: torch.from_numpy(np.asarray(v, dtype=np.float32))
          for k, v in export_state_dict(params, model).items()}
    ref.load_state_dict(sd, strict=True)
    ref.eval()

    rng = np.random.default_rng(0)
    x = rng.random((2, 33, 41, 3)).astype(np.float32)
    mu_j, sigma_j = model.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        mu_t, sigma_t = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    np.testing.assert_allclose(np.asarray(mu_j),
                               mu_t.numpy().transpose(0, 2, 3, 1),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(sigma_j),
                               sigma_t.numpy().transpose(0, 2, 3, 1),
                               atol=2e-6)


@pytest.mark.parametrize("sf", [2, 4])
def test_sisr_forward_matches_reference_model(ref_networks, sf):
    import jax
    import jax.numpy as jnp
    import torch

    from virnet_tpu.convert.torch_export import export_state_dict
    from virnet_tpu.models import VIRNetSR

    n_feat, dep_s, dep_k, n_res = (16, 24, 32), 3, 2, 1
    model = VIRNetSR(sigma_chn=1, kernel_chn=3, n_feat=n_feat, dep_S=dep_s,
                     dep_K=dep_k, n_resblocks=n_res, extra_mode="both",
                     noise_avg=True)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)),
                        sf)["params"]

    ref = ref_networks["VIRAttResUNetSR"](
        im_chn=3, sigma_chn=1, kernel_chn=3, n_feat=list(n_feat),
        dep_S=dep_s, dep_K=dep_k, noise_cond=True, kernel_cond=True,
        n_resblocks=n_res, extra_mode="Both", noise_avg=True)
    sd = {k: torch.from_numpy(np.asarray(v, dtype=np.float32))
          for k, v in export_state_dict(params, model).items()}
    ref.load_state_dict(sd, strict=True)
    ref.eval()

    rng = np.random.default_rng(2)
    x = rng.random((2, 17, 19, 3)).astype(np.float32)
    mu_j, kinfo_j, sigma_j = model.apply({"params": params},
                                         jnp.asarray(x), sf)
    with torch.no_grad():
        mu_t, kinfo_t, sigma_t = ref(torch.from_numpy(
            x.transpose(0, 3, 1, 2)), sf)

    np.testing.assert_allclose(np.asarray(kinfo_j), kinfo_t.numpy(),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(sigma_j).reshape(2, -1),
                               sigma_t.numpy().reshape(2, -1), atol=2e-6)
    np.testing.assert_allclose(np.asarray(mu_j),
                               mu_t.numpy().transpose(0, 2, 3, 1),
                               atol=2e-5)
