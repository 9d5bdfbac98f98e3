"""Pallas stencil blur: interpret-mode parity vs the matmul formulation
(the TPU-compiled path is exercised in bench/TPU runs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from virnet_tpu.ops.degrade import blur_per_sample

pallas_blur = pytest.importorskip(
    "virnet_tpu.ops.pallas_blur", reason="pallas unavailable")


def test_forward_matches_matmul_path():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 16, 18, 3)).astype(np.float32))
    k = jnp.asarray(rng.random((2, 5, 5)).astype(np.float32))
    want = blur_per_sample(x, k, correlate=True)
    got = pallas_blur.blur_per_sample_pallas(x, k, "reflect", True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_forward_symmetric_padding():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, 12, 12, 1)).astype(np.float32))
    k = jnp.asarray(rng.random((1, 3, 3)).astype(np.float32))
    want = blur_per_sample(x, k, correlate=True, pad_mode="symmetric")
    got = pallas_blur.blur_per_sample_pallas(x, k, "symmetric", True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_gradients_match_matmul_path():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((2, 10, 10, 2)).astype(np.float32))
    k = jnp.asarray(rng.random((2, 3, 3)).astype(np.float32))
    g = jnp.asarray(rng.random((2, 10, 10, 2)).astype(np.float32))

    def loss_ref(x, k):
        return jnp.sum(blur_per_sample(x, k, correlate=True) * g)

    def loss_pl(x, k):
        return jnp.sum(pallas_blur.blur_per_sample_pallas(x, k, "reflect",
                                                          True) * g)

    dx_ref, dk_ref = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    dx_pl, dk_pl = jax.grad(loss_pl, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(dx_pl), np.asarray(dx_ref),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk_pl), np.asarray(dk_ref),
                               atol=1e-4)


def test_mxu_and_vpu_valid_kernels_match():
    """Both VALID-correlation kernels (MXU banded-matmul and VPU stencil)
    must agree with a direct einsum in interpret mode."""
    rng = np.random.default_rng(3)
    n, c, hp, wp, k = 2, 3, 14, 15, 5
    xp = jnp.asarray(rng.random((n, c, hp, wp)).astype(np.float32))
    kern = jnp.asarray(rng.random((n, k, k)).astype(np.float32))
    h, w = hp - k + 1, wp - k + 1
    want = np.zeros((n, c, h, w), np.float32)
    for di in range(k):
        for dj in range(k):
            want += (np.asarray(kern)[:, None, di, dj, None, None]
                     * np.asarray(xp)[:, :, di:di + h, dj:dj + w])
    got_mxu = pallas_blur._blur_mxu_valid(xp, kern, interpret=True)
    got_vpu = pallas_blur._blur_pallas_valid(xp, kern, interpret=True)
    np.testing.assert_allclose(np.asarray(got_mxu), want, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_vpu), want, atol=2e-5)


def test_valid_blur_dispatch():
    """MXU path when the band matrix fits VMEM, VPU stencil otherwise."""
    assert pallas_blur._use_mxu(21, 212, 192)        # training shapes
    assert not pallas_blur._use_mxu(21, 532, 512)    # eval whole images


def test_mxu_dx_matches_flip_fallback():
    """Direct transposed-banded dX kernel vs the flip-and-revalid path."""
    rng = np.random.default_rng(4)
    n, c, h, w, k = 2, 3, 12, 14, 5
    g = jnp.asarray(rng.random((n, c, h, w)).astype(np.float32))
    kern = jnp.asarray(rng.random((n, k, k)).astype(np.float32))
    got = pallas_blur._blur_mxu_dx(g, kern, interpret=True)
    gk = jnp.flip(kern, axis=(-2, -1))
    g_full = jnp.pad(g, ((0, 0), (0, 0), (k - 1, k - 1), (k - 1, k - 1)))
    want = pallas_blur._blur_pallas_valid(g_full, gk, interpret=True)
    assert got.shape == (n, c, h + k - 1, w + k - 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_dx_dispatch_uses_mxu_at_training_shapes():
    assert pallas_blur._use_mxu(21, 212, 192, c=3, hp=232)
