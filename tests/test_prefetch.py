"""DevicePrefetcher: ordering, determinism of the key↔batch pairing,
error propagation, and early shutdown.

The property that matters for training correctness: with the per-step
RNG key derived from the step counter (train/loop_denoise.run_step),
prefetching must not change *which* batch each step consumes — so a
prefetched run must produce bitwise-identical parameters to a
synchronous run.  That is asserted end-to-end here on the CPU mesh.
Reference role being replaced: torch DataLoader workers +
prefetch_factor (configs/denoising_syn.json:2-17).
"""

import numpy as np
import pytest

from virnet_tpu.data.prefetch import DevicePrefetcher
from virnet_tpu.train.mesh import make_mesh


def _np_batches(n, shape=(8, 8, 8, 3), seed=0):
    rng = np.random.default_rng(seed)
    return [rng.standard_normal(shape).astype(np.float32)
            for _ in range(n)]


def test_order_and_values_preserved():
    mesh = make_mesh()
    batches = _np_batches(7)
    out = list(DevicePrefetcher(iter(batches), mesh, depth=2))
    assert len(out) == 7
    for got, want in zip(out, batches):
        np.testing.assert_array_equal(np.asarray(got), want)


def test_pytree_batches_and_sharding():
    mesh = make_mesh()
    pairs = [(b, b + 1.0) for b in _np_batches(3)]
    out = list(DevicePrefetcher(iter(pairs), mesh, depth=2))
    assert len(out) == 3
    for (gn, gg), (wn, wg) in zip(out, pairs):
        np.testing.assert_array_equal(np.asarray(gn), wn)
        np.testing.assert_array_equal(np.asarray(gg), wg)
        # committed to the data sharding -> trainer's shard_batch is a no-op
        assert gn.sharding.mesh.shape == dict(mesh.shape)


def test_worker_error_propagates():
    mesh = make_mesh()

    def gen():
        yield _np_batches(1)[0]
        raise RuntimeError("sampler exploded")

    pf = DevicePrefetcher(gen(), mesh, depth=2)
    next(pf)
    with pytest.raises(RuntimeError, match="sampler exploded"):
        while True:
            next(pf)


def test_close_stops_worker():
    mesh = make_mesh()

    def gen():
        while True:
            yield _np_batches(1)[0]

    pf = DevicePrefetcher(gen(), mesh, depth=2)
    next(pf)
    pf.close()
    assert not pf._thread.is_alive()


def test_prefetched_training_bitwise_matches_synchronous():
    """3 steps of the denoise trainer, prefetch=2 vs prefetch=0: params
    must be identical — proves the per-step key/batch pairing survives."""
    import jax

    from virnet_tpu.train.loop_denoise import (DenoiseTrainConfig,
                                               DenoiseTrainer)

    def run(prefetch):
        cfg = DenoiseTrainConfig(
            batch_size=8, patch_size=32, dep_S=3, n_feat=(8, 16),
            n_resblocks=1, steps_per_epoch=3, epochs=2,
            mixed_precision=False, prefetch=prefetch,
            save_dir="/tmp/virnet_prefetch_test")
        tr = DenoiseTrainer(cfg)
        batches = _np_batches(3, shape=(8, 32, 32, 3), seed=7)
        batches = [np.clip(b * 0.2 + 0.5, 0, 1) for b in batches]
        tr.train_epoch(0, iter(batches))
        return tr.params

    p_sync = run(0)
    p_pre = run(2)
    flat_s = jax.tree_util.tree_leaves(p_sync)
    flat_p = jax.tree_util.tree_leaves(p_pre)
    for a, b in zip(flat_s, flat_p):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
