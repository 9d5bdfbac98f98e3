import jax
import numpy as np
import pytest

from virnet_tpu.train.mesh import (batch_sharded, init_multihost, make_mesh,
                                   replicate, replicated, shard_batch)
from virnet_tpu.train.resilience import run_with_auto_resume


def test_init_multihost_single_process_noop():
    assert init_multihost() == 1


def test_mesh_sharding_roundtrip():
    mesh = make_mesh()
    assert mesh.devices.size == 8    # conftest forces 8 virtual devices
    import jax.numpy as jnp

    batch = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    sharded = shard_batch(mesh, batch)
    np.testing.assert_array_equal(np.asarray(sharded), batch)
    assert len(sharded.sharding.device_set) == 8

    tree = replicate(mesh, {"w": jnp.ones((3,))})
    assert len(tree["w"].sharding.device_set) == 8


def test_auto_resume_retries_then_succeeds():
    calls = []

    def restore():
        return len(calls)

    def train(epoch_start):
        calls.append(epoch_start)
        if len(calls) < 3:
            raise RuntimeError("boom")

    run_with_auto_resume(train, restore, max_restarts=5, backoff_s=0.0,
                         log_fn=lambda *a: None)
    assert calls == [0, 1, 2]


def test_auto_resume_gives_up():
    def train(epoch_start):
        raise RuntimeError("always")

    with pytest.raises(RuntimeError):
        run_with_auto_resume(train, lambda: 0, max_restarts=2,
                             backoff_s=0.0, log_fn=lambda *a: None)
