"""Tests of the fused Pallas RNet tail (conv + bias + global residual in
one program, ops/pallas_conv.conv3x3_tail_residual) vs the XLA graph —
reference semantics: the networks/AttResUNet.py:173 tail conv followed by
the `+ x_in` global residual."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from virnet_tpu.models import build_model
from virnet_tpu.ops import pallas_conv as pc


def _xla_tail(x, xin, k, b):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    return y + b + xin


@pytest.mark.parametrize("co", [1, 3])
@pytest.mark.parametrize("shape", [(2, 8, 16, 8), (1, 12, 8, 4)])
def test_tail_residual_matches_xla(co, shape):
    rng = np.random.default_rng(7)
    n, h, w, c = shape
    x = jnp.asarray(rng.standard_normal((n, h, w, c)).astype(np.float32))
    xin = jnp.asarray(rng.standard_normal((n, h, w, co)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, c, co)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((co,)).astype(np.float32))
    want = _xla_tail(x, xin, k, b)
    got = pc.unpair(pc.conv3x3_tail_residual(
        pc.pair(x), pc.pair(xin), k, b, interpret=True))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_tail_residual_multi_tile():
    """Force nt > 1 so the clamped/zeroed halo blocks are exercised at
    both image borders and an interior tile boundary."""
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((1, 24, 8, 4)).astype(np.float32))
    xin = jnp.asarray(rng.standard_normal((1, 24, 8, 3)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 4, 3)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((3,)).astype(np.float32))
    want = _xla_tail(x, xin, k, b)
    orig = pc._VMEM_BUDGET
    pc._VMEM_BUDGET = 1          # -> 8-row tiles, nt = 3
    try:
        got = pc.unpair(pc.conv3x3_tail_residual(
            pc.pair(x), pc.pair(xin), k, b, interpret=True))
    finally:
        pc._VMEM_BUDGET = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("task,shape", [
    ("denoising-syn", (2, 64, 64, 3)),     # mod 4, pad-free
    ("denoising-real", (1, 64, 64, 3)),    # dep_S=8 arch
])
def test_model_fused_tail_matches_default(task, shape):
    """tail_impl='fused_interpret' end-to-end vs the default XLA tail on
    the same params (ConvParams declares the identical 'tail' subtree)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(shape, dtype=np.float32))
    model_ref = build_model(task)
    params = model_ref.init(jax.random.PRNGKey(0), x)["params"]
    mu_ref, sig_ref = model_ref.apply({"params": params}, x)
    model_fused = build_model(task, tail_impl="fused_interpret")
    mu, sig = model_fused.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(sig), np.asarray(sig_ref), atol=0)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref),
                               atol=5e-6)


def test_model_fused_tail_pad_fallback():
    """At a shape where pad_to_multiple is active, the 'fused' tail_impl
    degrades to the plain XLA conv and still matches the default path."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, 30, 30, 3), dtype=np.float32))
    model_ref = build_model("denoising-syn")
    params = model_ref.init(jax.random.PRNGKey(0), x)["params"]
    mu_ref, _ = model_ref.apply({"params": params}, x)
    model_fused = build_model("denoising-syn", tail_impl="fused_interpret")
    mu, _ = model_fused.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref),
                               atol=1e-6)


def test_engine_fused_tail_resolution():
    """Restorer(fused_tail=True) resolves to interpret mode on non-TPU
    backends (tests/CI) and leaves the default model untouched."""
    from virnet_tpu.eval.engine import Restorer
    r = Restorer("denoising-syn",
                 ckpt_path="model_zoo/virnet_denoising_syn_demo.pth",
                 fused_tail=True)
    assert r.model.tail_impl == "fused_interpret"
    r_def = Restorer("denoising-syn",
                     ckpt_path="model_zoo/virnet_denoising_syn_demo.pth")
    assert r_def.model.tail_impl == ""


def test_sisr_fused_tail_matches_default():
    """The SISR arch's tail (out_chn=3 after the in-model upsample) takes
    the same fused path."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32))
    model_ref = build_model("sisr")
    params = model_ref.init(jax.random.PRNGKey(0), x, 2)["params"]
    mu_ref, kinfo_ref, sig_ref = model_ref.apply({"params": params}, x, 2)
    model_fused = build_model("sisr", tail_impl="fused_interpret")
    mu, kinfo, sig = model_fused.apply({"params": params}, x, 2)
    np.testing.assert_allclose(np.asarray(kinfo), np.asarray(kinfo_ref),
                               atol=0)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref),
                               atol=5e-6)


def test_tail_residual_bf16_features_f32_residual():
    """Mixed dtypes = the engine's bf16-compute path: features are bf16
    but the residual input (the raw image) stays f32, and the unfused
    tail's `conv(x) + x_in` therefore yields an f32 final image.  The
    fused op must emit the sum in the RESIDUAL's dtype — re-rounding to
    bf16 added a full quantization of the output (ADVICE r4, medium)."""
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((1, 8, 16, 8)),
                    dtype=jnp.float32).astype(jnp.bfloat16)
    xin = jnp.asarray(rng.standard_normal((1, 8, 16, 3)),
                      dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 8, 3)),
                    dtype=jnp.float32).astype(jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((3,)),
                    dtype=jnp.float32).astype(jnp.bfloat16)
    got = pc.unpair(pc.conv3x3_tail_residual(
        pc.pair(x), pc.pair(xin), k, b, interpret=True))
    assert got.dtype == jnp.float32
    # unfused semantics: f32-accumulated conv rounded once to bf16
    # (attresunet.py unfused branch: (conv + b).astype(x.dtype)), then
    # added to the f32 residual in f32
    conv = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    want = ((conv + b.astype(jnp.float32)).astype(jnp.bfloat16)
            .astype(jnp.float32) + xin)
    # accumulation-order diffs can flip a bf16 rounding on values near a
    # boundary; bound by ~1 bf16 ulp at the conv's magnitude
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=0.09)
    # the defect being regressed: an output re-rounded to bf16 is fully
    # bf16-representable; the true f32 sum is not
    g = np.asarray(got)
    assert np.any(g != np.asarray(jnp.asarray(g, jnp.bfloat16),
                                  np.float32))


def test_model_fused_tail_bf16_compute_matches_default():
    """Under the engine's bf16 compute context the fused tail keeps the
    final image in f32 like the default graph (the ADVICE r4 defect
    re-rounded it to bf16), and tracks it to ~1 bf16 ulp — exact
    equality is not expected: flax's nn.Conv rounds conv then conv+bias
    (two bf16 roundings) where the fused kernel accumulates both in f32
    (one rounding)."""
    from virnet_tpu import precision

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
    model_ref = build_model("denoising-syn")
    params = model_ref.init(jax.random.PRNGKey(0), x)["params"]
    model_fused = build_model("denoising-syn", tail_impl="fused_interpret")
    with precision.precision("default"):
        with precision.compute_dtype(jnp.bfloat16):
            mu_ref, _ = model_ref.apply({"params": params}, x)
            mu, _ = model_fused.apply({"params": params}, x)
    assert mu.dtype == jnp.float32
    assert mu.dtype == mu_ref.dtype
    np.testing.assert_allclose(np.asarray(mu, np.float32),
                               np.asarray(mu_ref, np.float32), atol=0.02)
