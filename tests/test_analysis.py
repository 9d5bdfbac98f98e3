import math

import jax
import jax.numpy as jnp
import numpy as np

from virnet_tpu.eval.analysis import (calculate_eta_min, calculate_flops,
                                      calculate_parameters, measure_time,
                                      schedule_preview)


def test_calculate_parameters():
    tree = {"a": jnp.ones((3, 4)), "b": {"c": jnp.ones((5,))}}
    assert calculate_parameters(tree) == 17


def test_calculate_flops_matmul():
    a = jnp.ones((64, 128))
    b = jnp.ones((128, 32))
    flops = calculate_flops(lambda x, y: x @ y, a, b)
    # 2*M*N*K
    assert flops >= 2 * 64 * 128 * 32 * 0.5   # backend may fold; sanity only
    assert np.isfinite(flops)


def test_measure_time_runs():
    f = jax.jit(lambda x: x * 2)
    t = measure_time(f, (jnp.ones((128, 128)),), num_forward=5)
    assert t > 0


def test_schedule_preview_and_eta_min():
    sched = lambda step: step * 0.1  # noqa: E731
    prev = schedule_preview(sched, epochs=3, steps_per_epoch=10)
    assert prev == {0: 0.0, 1: 1.0, 2: 2.0}

    # eta_min solves the cosine endpoint equation (reference util_net.py:67)
    epochs, eta_max, lr_min, t_max = 100, 1e-4, 1e-6, 99
    eta_min = calculate_eta_min(epochs, eta_max, lr_min, t_max)
    coef = 0.5 * (1 + math.cos((epochs - 1) / t_max * math.pi))
    assert abs(eta_min + (eta_max - eta_min) * coef - lr_min) < 1e-12
