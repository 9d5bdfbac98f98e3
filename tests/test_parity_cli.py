"""End-to-end test of the one-command parity CLI: with IDENTICAL weights
(a fixture .pth in the released key convention), both implementations must
land within the ±0.01 dB goal and the CLI must report PASS (exit 0).

This is the staged form of the released-checkpoint comparison: when the
real .pth files land in model_zoo/, the same command produces the paper
tables' deltas.
"""

from pathlib import Path

import numpy as np
import pytest
import torch

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference tree not mounted")


@pytest.fixture(scope="module")
def syn_fixture_pth(tmp_path_factory):
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    try:
        from test_torch_parity import _make_attresunet, _make_dncnn
    finally:
        sys.path.pop(0)
    # the builders draw from torch's GLOBAL rng — pin it so the fixture is
    # identical regardless of which tests ran before (order-independence)
    torch.manual_seed(0)
    sd = {}
    _make_dncnn(sd, "SNet", 3, 1, 5)
    _make_attresunet(sd, "RNet", 3, 1, 3, (96, 192, 288), 3, "input")
    path = tmp_path_factory.mktemp("zoo") / "virnet_denoising_syn.pth"
    torch.save({"model_state_dict": sd}, path)
    return str(path)


def test_parity_cli_pass_at_identical_weights(syn_fixture_pth, capsys):
    from virnet_tpu.cli.parity import main

    rc = main(["--task", "denoising-syn", "--ckpt_path", syn_fixture_pth,
               "--limit", "1", "--noise_types", "iid",
               "--tmp_dir", str(Path(syn_fixture_pth).parent / "tmp")])
    out = capsys.readouterr().out
    assert "PASS" in out, out
    assert rc == 0
    # all three iid cases scored, with real numbers in the table
    assert out.count("CBSD68/") == 3


def test_parity_cli_missing_ckpt_is_reported(capsys):
    from virnet_tpu.cli.parity import main

    rc = main(["--task", "denoising-syn",
               "--ckpt_path", "/nonexistent/x.pth"])
    out = capsys.readouterr().out
    assert rc == 2
    assert "skipped" in out


def test_torch_restorer_matches_jax_restorer(syn_fixture_pth):
    """Direct spot check of the adapter at one image."""
    import jax.numpy as jnp

    from virnet_tpu.cli.parity import TorchRestorer
    from virnet_tpu.eval.engine import Restorer

    ours = Restorer("denoising-syn", ckpt_path=syn_fixture_pth)
    ref = TorchRestorer("denoising-syn", syn_fixture_pth)
    rng = np.random.default_rng(0)
    x = rng.random((1, 64, 64, 3)).astype(np.float32)
    a = np.asarray(ours.restore_batch(jnp.asarray(x)))
    b = ref.restore_batch(x)
    np.testing.assert_allclose(a, b, atol=5e-5)
