"""Benchmark: restored megapixels/sec/chip on the flagship denoiser.

Mirrors the reference's SIDD 'megatime' protocol in spirit
(scripts/denoising_virnet_real_sidd.py:127-156: wall-time per restored
megapixel on 256^2 blocks), measured here as throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is value / A100-PyTorch-reference estimate; BASELINE.json
ships no published number, so the denominator is the measured-protocol
placeholder documented in BASELINE.md (updated when the reference numbers
are measured).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from virnet_tpu.models import build_model
    from virnet_tpu import precision

    # throughput path: bf16-friendly matmul precision
    precision.set_precision("default")

    model = build_model("denoising-syn")
    key = jax.random.PRNGKey(0)

    batch, size = 8, 256
    x = jax.random.uniform(key, (batch, size, size, 3), jnp.float32)
    variables = model.init(key, x)
    params = variables["params"]

    @jax.jit
    def forward(params, x):
        mu, _ = model.apply({"params": params}, x)
        return jnp.clip(mu, 0.0, 1.0)

    # warmup + compile; fetch to host — on the tunneled axon backend only a
    # host transfer reliably waits for real execution
    np.asarray(forward(params, x))

    n_iters = 30
    tic = time.perf_counter()
    y = x
    for _ in range(n_iters):
        y = forward(params, y)          # chained: no fake pipelining
    np.asarray(y)
    toc = time.perf_counter()

    mp = batch * size * size / 1e6          # megapixels per call
    mps = n_iters * mp / (toc - tic)

    # A100-PyTorch reference throughput is not published in the repo
    # (BASELINE.md); using the protocol's provisional denominator of
    # 1 MP/s until the reference measurement lands.
    baseline_mps = 1.0
    print(json.dumps({
        "metric": "restored_megapixels_per_sec_per_chip",
        "value": round(mps, 3),
        "unit": "MP/s",
        "vs_baseline": round(mps / baseline_mps, 3),
    }))


if __name__ == "__main__":
    main()
