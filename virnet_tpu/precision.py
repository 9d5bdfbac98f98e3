"""Global matmul/conv precision policy.

XLA's default dot/conv precision is reduced (bf16 passes on the TPU MXU, and
a similarly truncated path on CPU), which costs ~1e-3 absolute error — far
above the ±0.01 dB parity budget for checkpoint-faithful inference.  All
convs/matmuls in this package therefore route through this policy:

  * ``'highest'`` (default) — full fp32 accumulation; used for parity eval,
    tests, and the degradation operators inside the loss.
  * ``'default'`` — XLA's fast path (bf16 MXU passes); opt in for
    throughput-oriented training/benchmarks where the model tolerates it.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax.lax as lax

_PRECISION = lax.Precision.HIGHEST


def get_precision():
    return _PRECISION


def set_precision(p):
    """p: 'highest' | 'default' | a jax.lax.Precision value."""
    global _PRECISION
    if isinstance(p, str):
        p = {"highest": lax.Precision.HIGHEST,
             "high": lax.Precision.HIGH,
             "default": lax.Precision.DEFAULT}[p.lower()]
    _PRECISION = p


@contextmanager
def precision(p):
    old = _PRECISION
    set_precision(p)
    try:
        yield
    finally:
        set_precision(old)
