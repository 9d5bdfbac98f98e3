"""int8 W8A8 conv path (ops/qconv.py + models/common.QuantConv).

Accuracy oracles run on the CPU backend: the int8 conv's int32
accumulation is exact, so with inputs constructed to quantize exactly the
quantized conv must match the f32 conv to float-rounding; random inputs
bound the quantization error.
"""

import jax
import jax.numpy as jnp
import numpy as np

from virnet_tpu import precision
from virnet_tpu.models import build_model
from virnet_tpu.models.common import QuantConv, conv
from virnet_tpu.ops.qconv import conv_w8a8, quantize_symmetric


def _f32_conv(x, k, b=None, stride=1, padding=1):
    y = jax.lax.conv_general_dilated(
        x, k, (stride, stride), [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    return y if b is None else y + b


def test_quantize_symmetric_roundtrip_exact():
    rng = np.random.default_rng(0)
    # values that are exact multiples of absmax/127 per channel
    q = rng.integers(-127, 128, size=(2, 8, 8, 4)).astype(np.float32)
    q[0, 0, 0, :] = 127.0  # pin the absmax per channel
    scale = np.array([0.01, 0.5, 2.0, 0.003], np.float32)
    x = jnp.asarray(q * scale)
    xq, s = quantize_symmetric(x, axes=(0, 1, 2))
    np.testing.assert_array_equal(np.asarray(xq), q.astype(np.int8))
    np.testing.assert_allclose(np.asarray(s).ravel(), scale, rtol=1e-6)


def test_conv_w8a8_exactly_quantizable_inputs():
    rng = np.random.default_rng(1)
    ci, co = 16, 24
    xq = rng.integers(-127, 128, size=(2, 10, 10, ci)).astype(np.float32)
    xq[0, 0, 0, :] = 127.0
    x = jnp.asarray(xq * 0.01)
    # kernel already scaled per input channel so the fold is exact
    kq = rng.integers(-127, 128, size=(3, 3, ci, co)).astype(np.float32)
    kq[0, 0, :, :] = 127.0
    k = jnp.asarray(kq * 0.001)
    got = conv_w8a8(x, k)
    want = _f32_conv(x, k)
    # int32 accumulation is exact; only the two scale multiplies round
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_conv_w8a8_error_bound_random():
    key = jax.random.PRNGKey(2)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (2, 16, 16, 64), jnp.float32)
    k = jax.random.normal(k2, (3, 3, 64, 64), jnp.float32) * 0.05
    b = jnp.linspace(-0.1, 0.1, 64)
    got = np.asarray(conv_w8a8(x, k, b))
    want = np.asarray(_f32_conv(x, k, b))
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.02, f"relative quantization error {rel:.4f}"


def test_conv_w8a8_per_channel_beats_mismatched_ranges():
    """Per-input-channel folding: a channel 100x larger than the rest
    must not wash out the small channels' precision."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 12, 12, 32)).astype(np.float32)
    x[..., 0] *= 100.0
    k = (rng.normal(size=(3, 3, 32, 32)) * 0.05).astype(np.float32)
    got = np.asarray(conv_w8a8(jnp.asarray(x), jnp.asarray(k)))
    want = np.asarray(_f32_conv(jnp.asarray(x), jnp.asarray(k)))
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    # per-TENSOR activation quant collapses the 31 small channels to a
    # handful of int8 levels here (~30%+ error); per-channel keeps the
    # usual few-percent quantization noise
    assert rel < 0.03, f"relative quantization error {rel:.4f}"


def test_conv_gate_uses_quantconv_only_when_wide_enough():
    with precision.quant_mode("int8"):
        assert isinstance(conv(64, 3, 64), QuantConv)
        assert isinstance(conv(96, 3, 96), QuantConv)
        assert not isinstance(conv(3, 3, 96), QuantConv)    # tail
        assert not isinstance(conv(64, 3, 4), QuantConv)    # sigma head
        assert not isinstance(conv(64, 3, 64, stride=2), QuantConv)
    assert not isinstance(conv(64, 3, 64), QuantConv)       # mode off


def test_quantconv_param_tree_matches_float_conv():
    x = jnp.zeros((1, 8, 8, 64))
    f = conv(64, 3, 64, name="c")
    with precision.quant_mode("int8"):
        q = conv(64, 3, 64, name="c")
    pf = f.init(jax.random.PRNGKey(0), x)["params"]
    pq = q.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(pf) == jax.tree_util.tree_structure(pq)
    for a, b in zip(jax.tree_util.tree_leaves(pf),
                    jax.tree_util.tree_leaves(pq)):
        assert a.shape == b.shape and a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_model_forward_under_int8_close_to_f32():
    model = build_model("denoising-syn")
    key = jax.random.PRNGKey(4)
    params = model.init(key, jnp.zeros((1, 64, 64, 3)))["params"]
    x = jax.random.uniform(key, (1, 64, 64, 3), jnp.float32)
    mu_f, _ = model.apply({"params": params}, x)
    with precision.quant_mode("int8"):
        mu_q, _ = model.apply({"params": params}, x)
    assert np.all(np.isfinite(np.asarray(mu_q)))
    # untrained nets amplify op-level error; just require same ballpark
    rel = (np.linalg.norm(np.asarray(mu_q) - np.asarray(mu_f))
           / np.linalg.norm(np.asarray(mu_f)))
    assert rel < 0.5, f"int8 forward diverged: rel {rel:.3f}"


def test_restorer_compute_int8_end_to_end():
    from virnet_tpu.eval.engine import Restorer

    model = build_model("denoising-syn")
    params = model.init(jax.random.PRNGKey(5),
                        jnp.zeros((1, 64, 64, 3)))["params"]
    r = Restorer("denoising-syn", params=params, compute="int8")
    im = np.random.default_rng(6).uniform(
        size=(40, 52, 3)).astype(np.float32)
    out = r.restore_image(im)
    assert out.shape == im.shape and np.all(np.isfinite(out))
    assert 0.0 <= out.min() and out.max() <= 1.0
