"""LR schedule golden test against the real torch CosineAnnealingLR stepped
the way the reference steps it (per epoch, after a multiplier=1 warmup)."""

import numpy as np
import torch

from virnet_tpu.train.optim import (build_optimizer, clip_by_subtree_norm,
                                    warmup_cosine_epoch_schedule)


def torch_reference_lrs(base, lr_min, epochs, warmup):
    param = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([param], lr=base)
    cos = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, T_max=max(epochs - warmup, 1), eta_min=lr_min)
    lrs = []
    for e in range(epochs):
        if e < warmup:
            lrs.append(base * (e + 1) / warmup)       # GradualWarmup mult=1
        else:
            lrs.append(opt.param_groups[0]["lr"])
            cos.step()
    return lrs


def test_schedule_matches_torch_cosine_warmup():
    base, lr_min, epochs, warmup, spe = 1e-4, 1e-6, 30, 5, 10
    sched = warmup_cosine_epoch_schedule(base, lr_min, epochs, warmup, spe)
    want = torch_reference_lrs(base, lr_min, epochs, warmup)
    got = [float(sched(e * spe)) for e in range(epochs)]
    np.testing.assert_allclose(got, want, rtol=1e-4)
    # constant within an epoch
    assert float(sched(7 * spe)) == float(sched(7 * spe + spe - 1))


def test_schedule_no_warmup_pure_cosine():
    base, lr_min, epochs, spe = 2e-4, 1e-6, 20, 5
    sched = warmup_cosine_epoch_schedule(base, lr_min, epochs, 0, spe)
    want = torch_reference_lrs(base, lr_min, epochs, 0)
    got = [float(sched(e * spe)) for e in range(epochs)]
    np.testing.assert_allclose(got, want, rtol=1e-4)
    assert abs(got[0] - base) < 1e-9   # fp32 representation of 2e-4


def test_clip_by_subtree_norm():
    import jax.numpy as jnp

    grads = {
        "rnet": {"w": jnp.full((10,), 100.0)},        # norm ≈ 316
        "snet": {"w": jnp.full((4,), 0.1)},           # norm = 0.2
    }
    tx = clip_by_subtree_norm({"rnet": 1.0, "snet": 10.0})
    state = tx.init(grads)
    out, _ = tx.update(grads, state)
    # rnet scaled to norm 1, snet untouched
    np.testing.assert_allclose(
        float(jnp.linalg.norm(out["rnet"]["w"])), 1.0, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["snet"]["w"]), 0.1, rtol=1e-6)


def test_build_optimizer_runs():
    import jax.numpy as jnp
    import optax

    tx, sched = build_optimizer(1e-4, 1e-6, 10, 2, 5,
                                clip_map={"rnet": 1e3})
    params = {"rnet": {"w": jnp.ones((3,))}, "snet": {"w": jnp.ones((3,))}}
    state = tx.init(params)
    grads = {"rnet": {"w": jnp.ones((3,))}, "snet": {"w": jnp.ones((3,))}}
    updates, state = tx.update(grads, state, params)
    new_params = optax.apply_updates(params, updates)
    assert float(new_params["rnet"]["w"][0]) != 1.0
