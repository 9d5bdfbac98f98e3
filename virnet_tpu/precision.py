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


# ---------------------------------------------------------------------------
# Compute dtype policy (mixed precision)
#
# Image-restoration U-Nets at training resolution are HBM-bandwidth-bound
# (the SISR RNet gradient moves ~94 GB/step in fp32 — measured via XLA cost
# analysis).  bf16 activations halve that; parameters and the optimizer
# stay fp32.  None (default) = compute in the parameter dtype (fp32).
# ---------------------------------------------------------------------------

_COMPUTE_DTYPE = None


def get_compute_dtype():
    return _COMPUTE_DTYPE


# ---------------------------------------------------------------------------
# Quantized-serving policy
#
# 'int8' routes qualifying 3x3 convs (models/common.py:conv gate) through
# the W8A8 MXU path (ops/qconv.py): 2x the bf16 MXU peak, at a measured
# quantization cost to the restored image.  Opt-in only (--compute int8);
# never a parity path.
# ---------------------------------------------------------------------------

_QUANT_MODE = None


def get_quant_mode():
    return _QUANT_MODE


def set_quant_mode(mode):
    """mode: None | 'int8'."""
    global _QUANT_MODE
    if mode not in (None, "none", "int8"):
        raise ValueError(f"quant mode must be None|'int8', got {mode!r}")
    _QUANT_MODE = None if mode in (None, "none") else mode


@contextmanager
def quant_mode(mode):
    global _QUANT_MODE
    old = _QUANT_MODE
    set_quant_mode(mode)
    try:
        yield
    finally:
        _QUANT_MODE = old


def set_compute_dtype(dtype):
    """dtype: None | 'bfloat16' | 'float32' | a jnp dtype."""
    global _COMPUTE_DTYPE
    if isinstance(dtype, str):
        import jax.numpy as jnp
        dtype = {"bfloat16": jnp.bfloat16, "float32": None,
                 "none": None}[dtype.lower()]
    _COMPUTE_DTYPE = dtype


@contextmanager
def compute_dtype(dtype):
    old = _COMPUTE_DTYPE
    set_compute_dtype(dtype)
    try:
        yield
    finally:
        set_compute_dtype(old)
