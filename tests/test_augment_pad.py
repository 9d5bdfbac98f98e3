import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from virnet_tpu.ops import augment as A
from virnet_tpu.ops import pad as P


def test_dihedral_roundtrip_jnp():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)).astype(np.float32))
    for mode in range(8):
        y = A.dihedral_inverse(A.dihedral(x, mode), mode)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x))


def test_dihedral_roundtrip_np():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((8, 8, 3)).astype(np.float32)
    for mode in range(8):
        y = A.dihedral_inverse_np(A.dihedral_np(x, mode), mode)
        np.testing.assert_allclose(y, x)


def test_dihedral_matches_torch_tensor_semantics():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 3, 6, 6)).astype(np.float32)

    def torch_mode(xt, mode):
        t = torch.from_numpy(xt)
        if mode == 0:
            return t.numpy()
        if mode == 1:
            return t.flip(2).numpy()
        rot = torch.rot90(t, k=-(mode // 2), dims=[2, 3])
        if mode % 2 == 1:
            rot = rot.flip(2)
        return rot.numpy()

    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    for mode in range(8):
        got = np.asarray(A.dihedral(xj, mode)).transpose(0, 3, 1, 2)
        want = torch_mode(x, mode)
        np.testing.assert_allclose(got, want)


def test_dihedral_stack_mean_identity():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)).astype(np.float32))
    y8 = A.dihedral_stack(x)
    assert y8.shape == (8, 2, 8, 8, 3)
    out = A.dihedral_unstack_mean(y8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_pad_to_multiple_matches_torch_reflect():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 13, 10, 3)).astype(np.float32)
    got = np.asarray(P.pad_to_multiple(jnp.asarray(x), 4))
    assert got.shape == (1, 16, 12, 3)
    want = F.pad(torch.from_numpy(x.transpose(0, 3, 1, 2)), (0, 2, 0, 3),
                 mode="reflect").numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want)


def test_modcrop():
    im = np.zeros((13, 10, 3))
    assert P.modcrop(im, 4).shape == (12, 8, 3)
