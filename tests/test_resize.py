"""The resampler must reproduce ResizeRight math exactly; the golden here is
an independent gather-based implementation of the published equations."""

import math

import numpy as np
import pytest

from virnet_tpu.ops import resize as R


def _gather_resize_1d(vec, out_sz, scale, method="cubic", antialias=True):
    """Literal gather-based resample of a 1-D signal (independent golden)."""
    kernel, support = R._KERNELS[method]
    if antialias and scale < 1.0:
        base = kernel
        kernel = lambda x: scale * base(scale * x)  # noqa: E731
        support = support / scale
    in_sz = vec.shape[0]
    eps = np.finfo(np.float32).eps
    out = np.zeros(out_sz)
    mirror = np.concatenate([np.arange(in_sz), np.arange(in_sz - 1, -1, -1)])
    for o in range(out_sz):
        p = o / scale + (in_sz - 1) / 2 - (out_sz - 1) / (2 * scale)
        left = int(np.ceil(p - support / 2 - eps))
        idx = np.array([left + t for t in range(int(math.ceil(support - eps)))])
        idx = mirror[np.remainder(idx, 2 * in_sz)]
        w = kernel(p - idx)
        s = w.sum()
        if s == 0:
            s = 1.0
        w = w / s
        out[o] = (vec[idx] * w).sum()
    return out


@pytest.mark.parametrize("in_sz,scale", [(32, 0.5), (33, 1 / 3), (16, 2.0),
                                         (21, 0.25), (13, 1 / 2)])
@pytest.mark.parametrize("method", ["cubic", "linear", "lanczos3", "box"])
def test_matrix_matches_gather(in_sz, scale, method):
    rng = np.random.default_rng(0)
    vec = rng.standard_normal(in_sz)
    out_sz = int(math.ceil(scale * in_sz))
    mat = R.resize_matrix(in_sz, out_sz, scale, method)
    got = mat @ vec
    want = _gather_resize_1d(vec, out_sz, scale, method)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_resize_np_2d_separable():
    rng = np.random.default_rng(1)
    im = rng.standard_normal((24, 16, 3)).astype(np.float32)
    out = R.resize_np(im, scale_factors=0.5, axes=(0, 1))
    assert out.shape == (12, 8, 3)
    # separable: rows then cols must equal explicit per-axis application
    m0 = R.resize_matrix(24, 12, 0.5)
    m1 = R.resize_matrix(16, 8, 0.5)
    want = np.einsum("oh,hwc->owc", m0, im.astype(np.float64))
    want = np.einsum("ow,hwc->hoc", m1, want).transpose(0, 1, 2)
    np.testing.assert_allclose(out, want, atol=1e-12)


def test_resize_nhwc_matches_np():
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 20, 28, 3)).astype(np.float32)
    got = np.asarray(R.resize_nhwc(jnp.asarray(x), scale_factors=0.25))
    want = np.stack([R.resize_np(x[i], scale_factors=0.25) for i in range(2)])
    np.testing.assert_allclose(got, want.astype(np.float32), atol=1e-5)


def test_identity_scale_passthrough():
    import jax.numpy as jnp

    x = jnp.ones((1, 8, 8, 3))
    out = R.resize_nhwc(x, scale_factors=1.0)
    assert out.shape == x.shape


def test_upscale_shape_ceil():
    # out = ceil(scale * in)
    mat = R.resize_matrix(10, int(math.ceil(10 * 1.5)), 1.5)
    assert mat.shape == (15, 10)
    np.testing.assert_allclose(mat.sum(axis=1), 1.0, atol=1e-12)
