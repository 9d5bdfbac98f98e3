"""Bit-level tests of the boundary-free fused denoise prologue
(ops/pallas_conv.dncnn_head_fused + models/fused.py) vs the unfused
model graph — reference semantics networks/VIRNet.py:18-46 +
networks/AttResUNet.py head."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from virnet_tpu.models import build_model
from virnet_tpu.models.fused import (denoise_forward_fused,
                                     fused_head_supported)
from virnet_tpu.models.virnet import LOG_MAX, LOG_MIN
from virnet_tpu.ops import pallas_conv as pc


def _snet_head_params(model, params):
    sp = params["snet"]
    dep = model.dep_S
    return (sp["conv1"]["kernel"], sp["conv1"]["bias"],
            [sp[f"mid_{i}"]["kernel"] for i in range(1, dep - 1)],
            [sp[f"mid_{i}"]["bias"] for i in range(1, dep - 1)],
            sp["conv_last"]["kernel"], sp["conv_last"]["bias"],
            params["rnet"]["head"]["kernel"],
            params["rnet"]["head"]["bias"])


def _head_ref(x, sigma, kh, bh):
    hin = jnp.concatenate([x, jnp.sqrt(sigma)], axis=-1)
    y = jax.lax.conv_general_dilated(
        hin, kh, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    return y + bh


@pytest.mark.parametrize("task,shape", [
    ("denoising-syn", (2, 64, 64, 3)),     # sigma_chn=1, dep_S=5, mod 4
    ("denoising-syn", (1, 96, 160, 3)),    # non-square, multiple row tiles
    ("denoising-real", (1, 64, 64, 3)),    # sigma_chn=3, dep_S=8, mod 8
])
@pytest.mark.parametrize("mode", ["force_ops", "interpret"])
def test_fused_head_matches_model(task, shape, mode):
    model = build_model(task)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(shape, dtype=np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    mu_ref, sig_ref = model.apply({"params": params}, x)
    k1, b1, kms, bms, kl, bl, kh, bh = _snet_head_params(model, params)

    head, sig = pc.dncnn_head_fused(
        x, k1, b1, kms, bms, kl, bl, kh, bh, slope=0.25,
        lmin=LOG_MIN, lmax=LOG_MAX,
        force_ops=mode == "force_ops", interpret=mode == "interpret")
    href = _head_ref(x, sig_ref, kh, bh)
    tol = 0 if mode == "force_ops" else 5e-6
    np.testing.assert_allclose(np.asarray(sig), np.asarray(sig_ref),
                               atol=tol)
    np.testing.assert_allclose(np.asarray(head), np.asarray(href),
                               atol=tol)


def test_slabzero_probe_computes_slab_exact_math():
    """The halo-free upper-bound PROBE (mode='slabzero') must compute the
    REAL prologue math per slab — each r-row slab treated as an
    independent image — or its measured time means nothing.  Each output
    slab is compared against the force_ops graph run on that slab's
    effective input image (the kernel's input view is the zero-padded
    image shifted down one row, so slab t sees rows [t*r-1, t*r+r-1))."""
    model = build_model("denoising-syn")
    rng = np.random.default_rng(5)
    n, h, w = 1, 32, 32
    r = 16
    x = jnp.asarray(rng.random((n, h, w, 3), dtype=np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    k1, b1, kms, bms, kl, bl, kh, bh = _snet_head_params(model, params)

    head, sig = pc.dncnn_head_fused(
        x, k1, b1, kms, bms, kl, bl, kh, bh, slope=0.25,
        lmin=LOG_MIN, lmax=LOG_MAX, mode="slabzero", rows=r,
        interpret=True)
    assert head.shape == (n, h, w, kh.shape[3])

    xx = np.pad(np.asarray(x), ((0, 0), (1, 0), (0, 0), (0, 0)))[:, :h]
    for t in range(h // r):
        xs = jnp.asarray(xx[:, t * r:(t + 1) * r])
        h_ref, s_ref = pc.dncnn_head_fused(
            xs, k1, b1, kms, bms, kl, bl, kh, bh, slope=0.25,
            lmin=LOG_MIN, lmax=LOG_MAX, force_ops=True)
        np.testing.assert_allclose(
            np.asarray(sig[:, t * r:(t + 1) * r]), np.asarray(s_ref),
            atol=5e-6)
        np.testing.assert_allclose(
            np.asarray(head[:, t * r:(t + 1) * r]), np.asarray(h_ref),
            atol=5e-6)


def test_fused_forward_end_to_end():
    model = build_model("denoising-syn")
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    mu_ref, sig_ref = model.apply({"params": params}, x)
    mu, sig = denoise_forward_fused(model, params, x, interpret=True)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref),
                               atol=5e-6)
    np.testing.assert_allclose(np.asarray(sig), np.asarray(sig_ref),
                               atol=5e-6)


def test_supported_gate():
    model = build_model("denoising-syn")            # depth 3 -> mod 4
    assert fused_head_supported(model, (1, 64, 64, 3)) == pc.HAS_PALLAS
    assert not fused_head_supported(model, (1, 63, 64, 3))   # H % 4
    assert not fused_head_supported(model, (1, 64, 66, 3))   # W % 4
    real = build_model("denoising-real")            # depth 4 -> mod 8
    assert not fused_head_supported(real, (1, 68, 64, 3))
    sisr = build_model("sisr")
    assert not fused_head_supported(sisr, (1, 64, 64, 3))


def test_engine_fused_matches_unfused():
    """Restorer(fused_head=True) == Restorer(fused_head=False) on a
    qualifying shape, and still correct on a non-qualifying shape (the
    in-jit gate falls back per traced shape)."""
    from virnet_tpu.eval.engine import Restorer

    model = build_model("denoising-syn")
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    params = model.init(jax.random.PRNGKey(0), x0)["params"]
    r_ref = Restorer("denoising-syn", params=params, fused_head=False)
    r_fus = Restorer("denoising-syn", params=params, fused_head=True)
    for shape in [(2, 64, 64, 3), (1, 62, 64, 3)]:   # fused / fallback
        x = jnp.asarray(rng.random(shape, dtype=np.float32))
        a = np.asarray(r_ref.restore_batch(x))
        b = np.asarray(r_fus.restore_batch(x))
        np.testing.assert_allclose(a, b, atol=5e-6)


@pytest.mark.parametrize("task,shape,rows", [
    ("denoising-syn", (2, 64, 64, 3), 8),    # 8 tiles, 2 batch items
    ("denoising-syn", (1, 96, 160, 3), 16),  # non-square, 6 tiles
    ("denoising-syn", (1, 64, 64, 3), None),  # auto row slab
    ("denoising-real", (1, 64, 64, 3), 16),  # dep_S=8 -> L=6, hbp=16
])
def test_fused_head_carry_matches_model(task, shape, rows):
    """Line-buffer ('carry') kernel: cross-tile carries must reproduce
    the unfused graph exactly like the halo kernel does."""
    model = build_model(task)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random(shape, dtype=np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    mu_ref, sig_ref = model.apply({"params": params}, x)
    k1, b1, kms, bms, kl, bl, kh, bh = _snet_head_params(model, params)

    head, sig = pc.dncnn_head_fused(
        x, k1, b1, kms, bms, kl, bl, kh, bh, slope=0.25,
        lmin=LOG_MIN, lmax=LOG_MAX, mode="carry", rows=rows,
        interpret=True)
    href = _head_ref(x, sig_ref, kh, bh)
    np.testing.assert_allclose(np.asarray(sig), np.asarray(sig_ref),
                               atol=5e-6)
    np.testing.assert_allclose(np.asarray(head), np.asarray(href),
                               atol=5e-6)


def test_fused_head_carry_equals_halo():
    """Same program semantics, two tilings: carry and halo kernels agree
    to f32 accumulation noise on a multi-tile shape."""
    model = build_model("denoising-syn")
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    k1, b1, kms, bms, kl, bl, kh, bh = _snet_head_params(model, params)
    kw = dict(slope=0.25, lmin=LOG_MIN, lmax=LOG_MAX, interpret=True)
    h_halo, s_halo = pc.dncnn_head_fused(
        x, k1, b1, kms, bms, kl, bl, kh, bh, rows=16, **kw)
    h_carry, s_carry = pc.dncnn_head_fused(
        x, k1, b1, kms, bms, kl, bl, kh, bh, mode="carry", rows=16, **kw)
    np.testing.assert_allclose(np.asarray(s_carry), np.asarray(s_halo),
                               atol=5e-6)
    np.testing.assert_allclose(np.asarray(h_carry), np.asarray(h_halo),
                               atol=5e-6)


def test_engine_fused_carry_matches_unfused():
    """Restorer(fused_head='carry') == unfused on qualifying and
    fallback shapes."""
    from virnet_tpu.eval.engine import Restorer

    model = build_model("denoising-syn")
    rng = np.random.default_rng(5)
    x0 = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    params = model.init(jax.random.PRNGKey(0), x0)["params"]
    r_ref = Restorer("denoising-syn", params=params, fused_head=False)
    r_fus = Restorer("denoising-syn", params=params, fused_head="carry")
    for shape in [(2, 64, 64, 3), (1, 62, 64, 3)]:   # fused / fallback
        x = jnp.asarray(rng.random(shape, dtype=np.float32))
        a = np.asarray(r_ref.restore_batch(x))
        b = np.asarray(r_fus.restore_batch(x))
        np.testing.assert_allclose(a, b, atol=5e-6)


def test_engine_carry_rows_override():
    """Restorer(fused_head='carry:16') parses the row-slab pin and still
    matches the unfused forward (invalid pins fall back to auto inside
    dncnn_head_fused)."""
    from virnet_tpu.eval.engine import Restorer

    model = build_model("denoising-syn")
    rng = np.random.default_rng(7)
    x0 = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    params = model.init(jax.random.PRNGKey(0), x0)["params"]
    r_fus = Restorer("denoising-syn", params=params, fused_head="carry:16")
    assert r_fus.fused_head == "carry" and r_fus.fused_rows == 16
    r_ref = Restorer("denoising-syn", params=params, fused_head=False)
    x = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    np.testing.assert_allclose(np.asarray(r_ref.restore_batch(x)),
                               np.asarray(r_fus.restore_batch(x)),
                               atol=5e-6)
