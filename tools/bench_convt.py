"""A/B the UpBlock transposed-conv formulation on the flagship forward.

Variants, all bit-equivalent (tools-level check + tests/test_upsample.py):
  einsum  — current ops/upsample.conv_transpose_2x2 (einsum + reshape;
            XLA materializes an (h,w,a,b)->(h,a,w,b) transpose copy,
            1.4+0.8 ms in the round-3 fwd profile)
  convt   — lax.conv_transpose on the spatially-flipped kernel (XLA
            grad-conv emitter, no explicit transpose)

Marginal-scan timing (n1=8, n2=72 chained applies), variants interleaved
in one process to cancel dev-pool variance.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from virnet_tpu.models import build_model
from virnet_tpu.models import attresunet as att
from virnet_tpu.precision import get_precision

N1, N2 = 8, 72


def convt_lax(x, kernel, bias=None):
    y = lax.conv_transpose(x, kernel[::-1, ::-1], strides=(2, 2),
                           padding="VALID",
                           dimension_numbers=("NHWC", "HWIO", "NHWC"),
                           precision=get_precision())
    if bias is not None:
        y = y + bias
    return y


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def make_timer(batch, name):
    model = build_model("denoising-syn")
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, 64, 64, 3)))["params"]
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16),
                                    params)
    x = jax.random.uniform(key, (batch, 256, 256, 3), jnp.bfloat16)

    def apply_chain(n):
        @jax.jit
        def fn():
            def body(z, _):
                mu, _s = model.apply({"params": params}, z)
                return (mu * 0.99 + 0.01 * z).astype(jnp.bfloat16), None
            out, _ = lax.scan(body, x, None, length=n)
            return out.astype(jnp.float32).mean()
        return fn

    f1, f2 = apply_chain(N1), apply_chain(N2)
    log(f"{name}: compiling N1={N1}")
    np.asarray(f1())
    log(f"{name}: compiling N2={N2}")
    np.asarray(f2())
    log(f"{name}: compiled")

    def measure():
        t0 = time.perf_counter(); np.asarray(f1()); t1 = time.perf_counter()
        np.asarray(f2()); t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / (N2 - N1) * 1e3

    return measure


def main():
    import os

    variants = {}
    os.environ["VIRNET_TPU_CONVT_IMPL"] = "einsum"
    variants["einsum_b32"] = make_timer(32, "einsum_b32")
    os.environ["VIRNET_TPU_CONVT_IMPL"] = "lax"
    variants["convt_b32"] = make_timer(32, "convt_b32")
    os.environ["VIRNET_TPU_CONVT_IMPL"] = "einsum"

    res = {k: [] for k in variants}
    for rep in range(3):
        for k, m in variants.items():
            v = m()
            res[k].append(v)
            log(f"rep{rep} {k}: {v:.2f} ms/apply")
    for k, v in res.items():
        mp = 32 * 256 * 256 / 1e6
        best = min(v)
        print(f"{k}: ms/apply {['%.2f' % u for u in v]}  "
              f"best {best:.2f} -> {mp / best * 1e3:.2f} MP/s")


if __name__ == "__main__":
    main()
