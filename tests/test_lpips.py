"""Structure test for the TPU-native LPIPS against a torch replica.

The real LPIPS-alex weights are not in this image, so we validate the
architecture + importer with a torch replica of the published LPIPS v0.1
network (Zhang et al. 2018; the reference consumes it via the `lpips`
package, scripts/sisr_virnet_syn.py:96) holding identical RANDOM weights:
if the JAX implementation matches the replica for random weights across
random inputs, it matches for the released weights too.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from virnet_tpu.eval import lpips as jlpips


class _TorchLPIPSAlex(nn.Module):
    """Minimal replica of lpips.LPIPS(net='alex') forward semantics."""

    def __init__(self, seed=0):
        super().__init__()
        g = torch.Generator().manual_seed(seed)
        self.register_buffer(
            "shift", torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1))
        self.register_buffer(
            "scale", torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1))
        specs = [(3, 64, 11, 4, 2), (64, 192, 5, 1, 2), (192, 384, 3, 1, 1),
                 (384, 256, 3, 1, 1), (256, 256, 3, 1, 1)]
        self.convs = nn.ModuleList()
        self.lins = nn.ParameterList()
        for cin, cout, k, s, p in specs:
            conv = nn.Conv2d(cin, cout, k, s, p)
            with torch.no_grad():
                conv.weight.copy_(torch.randn(conv.weight.shape,
                                              generator=g) * 0.05)
                conv.bias.copy_(torch.randn(conv.bias.shape,
                                            generator=g) * 0.05)
            self.convs.append(conv)
            self.lins.append(nn.Parameter(
                torch.rand(cout, generator=g) * 0.1))   # non-negative

    def feats(self, x):
        h = (x - self.shift) / self.scale
        out = []
        for k, conv in enumerate(self.convs):
            if k in (1, 2):
                h = F.max_pool2d(h, 3, 2)
            h = F.relu(conv(h))
            out.append(h)
        return out

    @staticmethod
    def _norm(f, eps=1e-10):
        n = torch.sqrt(torch.sum(f ** 2, dim=1, keepdim=True))
        return f / (n + eps)

    def forward(self, x0, x1):
        f0, f1 = self.feats(x0), self.feats(x1)
        val = 0.0
        for k in range(5):
            d = (self._norm(f0[k]) - self._norm(f1[k])) ** 2
            lin = (d * self.lins[k].view(1, -1, 1, 1)).sum(dim=1)
            val = val + lin.mean(dim=(1, 2))
        return val

    # ---- exporters in the two supported on-disk layouts -------------------

    def state_dict_lpips_layout(self):
        tv_idx = [0, 3, 6, 8, 10]
        sd = {"scaling_layer.shift": self.shift,
              "scaling_layer.scale": self.scale}
        for k, conv in enumerate(self.convs):
            sd[f"net.slice{k + 1}.{tv_idx[k]}.weight"] = conv.weight
            sd[f"net.slice{k + 1}.{tv_idx[k]}.bias"] = conv.bias
            sd[f"lin{k}.model.1.weight"] = self.lins[k].view(-1, 1, 1, 1) \
                .transpose(0, 1).reshape(1, -1, 1, 1)
        return sd

    def state_dict_split_layout(self):
        tv_idx = [0, 3, 6, 8, 10]
        alex = {}
        for k, conv in enumerate(self.convs):
            alex[f"features.{tv_idx[k]}.weight"] = conv.weight
            alex[f"features.{tv_idx[k]}.bias"] = conv.bias
        lin = {f"lin{k}.model.1.weight":
               self.lins[k].reshape(1, -1, 1, 1) for k in range(5)}
        return {"alex": alex, "lin": lin}


@pytest.fixture(scope="module")
def replica():
    torch.manual_seed(0)
    return _TorchLPIPSAlex(seed=0).eval()


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(42)
    x0 = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    x1 = np.clip(x0 + rng.normal(0, 0.2, x0.shape), -1, 1).astype(np.float32)
    return x0, x1


def _torch_val(replica, x0, x1):
    t = lambda a: torch.from_numpy(a.transpose(0, 3, 1, 2))  # noqa: E731
    with torch.no_grad():
        return replica(t(x0), t(x1)).numpy()


def test_lpips_matches_torch_replica_lpips_layout(replica, images):
    x0, x1 = images
    params = jlpips.load_lpips_params(replica.state_dict_lpips_layout())
    got = np.asarray(jlpips.lpips_pair(params, x0, x1))
    want = _torch_val(replica, x0, x1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_lpips_matches_torch_replica_split_layout(replica, images):
    x0, x1 = images
    params = jlpips.load_lpips_params(replica.state_dict_split_layout())
    got = np.asarray(jlpips.lpips_pair(params, x0, x1))
    want = _torch_val(replica, x0, x1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_lpips_rgb_from_saved_pth(replica, tmp_path, monkeypatch):
    """End-to-end: torch.save a checkpoint, point the env var at it, score
    two uint8 images (the Table 5 call pattern)."""
    path = tmp_path / "lpips_alex.pth"
    torch.save(replica.state_dict_lpips_layout(), path)
    monkeypatch.setenv("VIRNET_LPIPS_WEIGHTS", str(path))
    monkeypatch.setattr(jlpips, "_PARAMS", None)
    assert jlpips.available()

    rng = np.random.default_rng(1)
    a = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
    b = np.clip(a.astype(int) + rng.integers(-30, 30, a.shape), 0,
                255).astype(np.uint8)
    got = jlpips.lpips_rgb(a, b)

    na = (a.astype(np.float32) - 127.5) / 127.5
    nb = (b.astype(np.float32) - 127.5) / 127.5
    want = _torch_val(replica, na[None], nb[None])[0]
    assert abs(got - want) < 1e-5
    assert jlpips.lpips_rgb(a, a) < 1e-8   # identical images -> ~0
    monkeypatch.setattr(jlpips, "_PARAMS", None)


def test_identity_and_symmetry(replica, images):
    x0, x1 = images
    params = jlpips.load_lpips_params(replica.state_dict_lpips_layout())
    d00 = np.asarray(jlpips.lpips_pair(params, x0, x0))
    np.testing.assert_allclose(d00, 0.0, atol=1e-9)
    d01 = np.asarray(jlpips.lpips_pair(params, x0, x1))
    d10 = np.asarray(jlpips.lpips_pair(params, x1, x0))
    np.testing.assert_allclose(d01, d10, rtol=1e-6)
    assert (d01 > 0).all()


@pytest.mark.parametrize("layout", ["lpips", "split"])
def test_eval_sisr_cli_lpips_end_to_end(tmp_path, monkeypatch, layout):
    """The day real LPIPS weights land, Table-5 LPIPS must be a file drop
    with zero code risk (VERDICT r4): drive the ACTUAL CLI
    (cli.eval_sisr) through a torch-saved checkpoint in each accepted
    on-disk layout and assert a finite score lands in the results dump.
    Reference: scripts/sisr_virnet_syn.py:96,158-161."""
    import cv2
    import math
    import pickle
    from pathlib import Path

    from virnet_tpu.cli.eval_sisr import main as eval_sisr_main

    # LPIPS weights file, real on-disk format
    replica = _TorchLPIPSAlex(seed=0)
    wpath = tmp_path / f"lpips_alex_{layout}.pth"
    torch.save(replica.state_dict_lpips_layout() if layout == "lpips"
               else replica.state_dict_split_layout(), wpath)

    # released-arch SISR fixture .pth (reference key convention)
    import sys
    sys.path.insert(0, str(Path(__file__).parent))
    from test_torch_parity import _make_dncnn, _make_knet, _make_attresunet

    torch.manual_seed(0)
    sd = {}
    _make_dncnn(sd, "SNet", 3, 1, 5)
    _make_knet(sd, "KNet", 3, 3, 64, 8)
    _make_attresunet(sd, "RNet", 3, 4, 3, (96, 160, 224), 2, "both")
    ckpt = tmp_path / "sisr_fixture.pth"
    torch.save({"model_state_dict": sd}, ckpt)

    # one tiny image per Table-5 dataset slot
    rng = np.random.default_rng(7)
    root = tmp_path / "data"
    (root / "Set14").mkdir(parents=True)
    (root / "CBSD68").mkdir()
    cv2.imwrite(str(root / "Set14" / "a.bmp"),
                rng.integers(0, 255, (48, 48, 3), dtype=np.uint8))
    cv2.imwrite(str(root / "CBSD68" / "b.png"),
                rng.integers(0, 255, (48, 48, 3), dtype=np.uint8))

    monkeypatch.setattr(jlpips, "_PARAMS", None)
    save_dir = tmp_path / "out"
    res = eval_sisr_main([
        "--ckpt_path", str(ckpt), "--sf", "2", "--nlevel", "2.55",
        "--data_root", str(root), "--save_dir", str(save_dir),
        "--lpips_weights", str(wpath)])
    with open(save_dir / "sisr_sf2_nl255.pkl", "rb") as f:
        dumped = pickle.load(f)
    for results in (res, dumped):
        for name in ("Set14", "CBSD68"):
            v = results[name]["lpips"]
            assert isinstance(v, float) and math.isfinite(v)
            assert all(isinstance(k["lpips"], float)
                       for k in results[name]["per_kernel"])
    monkeypatch.setattr(jlpips, "_PARAMS", None)


def test_table5_emits_lpips_with_weights(tmp_path, monkeypatch):
    """eval_sisr_synthetic scores LPIPS when weights are present (the
    Table 5 third metric, reference scripts/sisr_virnet_syn.py:158-161)."""
    import cv2
    import jax
    import jax.numpy as jnp

    from virnet_tpu.eval.engine import Restorer
    from virnet_tpu.eval.tables import eval_sisr_synthetic
    from virnet_tpu.models import build_model

    path = tmp_path / "lpips_alex.pth"
    torch.save(_TorchLPIPSAlex(seed=0).state_dict_lpips_layout(), path)
    monkeypatch.setenv("VIRNET_LPIPS_WEIGHTS", str(path))
    monkeypatch.setattr(jlpips, "_PARAMS", None)

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    cv2.imwrite(str(d / "a.png"),
                rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))

    overrides = dict(n_feat=(8, 16), dep_S=3, dep_K=2, n_resblocks=1)
    model = build_model("sisr", **overrides)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 16, 16, 3)), 2)["params"]
    restorer = Restorer("sisr", params=params, sf=2, pad_multiple=8,
                        **overrides)
    res = eval_sisr_synthetic(restorer, {"tiny": str(d)}, sf=2,
                              log_fn=lambda *a: None)
    assert "lpips" in res["tiny"]
    assert all("lpips" in k for k in res["tiny"]["per_kernel"])
    assert 0.0 <= res["tiny"]["lpips"] < 10.0
    monkeypatch.setattr(jlpips, "_PARAMS", None)
