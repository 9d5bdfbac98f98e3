"""Breadth benchmark: every perf-relevant path, regression-tracked per round.

Emits one JSON line per metric on stdout and writes the combined dict to
BENCH_FULL.json.  Results are recorded in BASELINE.md each round.
`bench.py` stays the driver's single-line primary metric; this sibling
covers the paths the verdict flagged as invisible to round-over-round
tracking: SISR forward, train-step throughput for both trainers, and the
SIDD-protocol megatime (reference scripts/denoising_virnet_real_sidd.py:127-156).

All timings use the marginal-scan method (see bench.py docstring): the dev
relay adds ~1 s fixed dispatch overhead and its block_until_ready can ack
early, so we jit a lax.scan of N chained applications at two lengths,
fetch to host, and report (N2-N1)*work/(t2-t1) — pure on-chip rate.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# A100-PyTorch estimates (derivations in BASELINE.md "A100-PyTorch
# baseline estimate"): 156 TFLOP/s TF32 peak x 50% eager utilization
# divided by the per-task FLOPs/work from the reference's thop protocol.
BASELINE = {
    "denoise_fwd_mps": 15.6,         # 4.99 TFLOP per restored MP
    "sisr_fwd_mps": None,            # filled per-arch below if derived
    "denoise_train_steps_per_s": None,
    "sisr_train_steps_per_s": None,
    "sidd_megatime_s_per_mp": 1 / 15.6 * 8,   # x8 TTA included, like Table 4
}


def marginal_time(make_fn, n1=4, n2=16, reps=5):
    """Best-of-reps marginal seconds per unit between scan lengths.

    The two lengths are timed INTERLEAVED per rep: timing all N1 reps
    then all N2 reps lets a co-tenant burst on the shared dev pool cover
    one phase only, which skews the marginal delta (bench.py observed a
    +30% outlier from exactly that)."""
    f1, f2 = make_fn(n1), make_fn(n2)
    o1 = f1()
    np.asarray(jax.tree_util.tree_leaves(o1)[0])   # compile + warm
    o2 = f2()
    np.asarray(jax.tree_util.tree_leaves(o2)[0])

    t1 = t2 = float("inf")
    for _ in range(reps):
        tic = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(f1())[0])
        mid = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(f2())[0])
        t1 = min(t1, mid - tic)
        t2 = min(t2, time.perf_counter() - mid)
    return (t2 - t1) / (n2 - n1)


def bench_denoise_fwd():
    from virnet_tpu.models import build_model

    model = build_model("denoising-syn")
    key = jax.random.PRNGKey(0)
    batch, size = 32, 256
    x = jax.random.uniform(key, (batch, size, size, 3), jnp.float32)
    params = model.init(key, jnp.zeros((1, 64, 64, 3)))["params"]
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)

    def make(length):
        @jax.jit
        def fwd_n():
            def body(y, _):
                mu, _ = model.apply({"params": params},
                                    y.astype(jnp.bfloat16))
                return jnp.clip(mu, 0.0, 1.0).astype(jnp.float32), 0.0
            y, _ = jax.lax.scan(body, x, None, length=length)
            return y
        return fwd_n

    sec = marginal_time(make, 6, 30)
    return batch * size * size / 1e6 / sec


def bench_sisr_fwd(sf=4):
    from virnet_tpu.models import build_model

    model = build_model("sisr")
    key = jax.random.PRNGKey(0)
    batch, size = 16, 64                       # LR input; output 256^2
    x = jax.random.uniform(key, (batch, size, size, 3), jnp.float32)
    params = model.init(key, jnp.zeros((1, 32, 32, 3)), sf)["params"]
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)

    def make(length):
        @jax.jit
        def fwd_n():
            def body(y, _):
                mu, _k, _s = model.apply({"params": params},
                                         y.astype(jnp.bfloat16), sf)
                # chain back through an average-pool so the carry keeps the
                # LR shape (output px still counted as restored work)
                lr = jax.image.resize(mu, y.shape, "nearest")
                return jnp.clip(lr, 0.0, 1.0).astype(jnp.float32), 0.0
            y, _ = jax.lax.scan(body, x, None, length=length)
            return y
        return fwd_n

    sec = marginal_time(make, 4, 16)
    out_mp = batch * (size * sf) ** 2 / 1e6
    return out_mp / sec


def _train_steps_per_s(trainer_cls, cfg, batch_shape):
    trainer = trainer_cls(cfg)
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.random(batch_shape, dtype=np.float32))
    params, opt_state = trainer.params, trainer.opt_state
    step_fn = trainer._train_step

    def make(length):
        @jax.jit
        def nsteps():
            def body(carry, i):
                p, o = carry
                key = jax.random.fold_in(jax.random.PRNGKey(0), i)
                p, o, aux = step_fn(p, o, batch, key)
                return (p, o), aux["loss"]
            (_, _), losses = jax.lax.scan(
                body, (params, opt_state), jnp.arange(length))
            return losses
        return nsteps

    sec = marginal_time(make, 2, 8, reps=3)
    return 1.0 / sec


def bench_denoise_train():
    from virnet_tpu.train.loop_denoise import (DenoiseTrainConfig,
                                               DenoiseTrainer)

    cfg = DenoiseTrainConfig(batch_size=16, patch_size=128,
                             save_dir="/tmp/bench_train")
    return _train_steps_per_s(DenoiseTrainer, cfg, (16, 128, 128, 3))


def bench_sisr_train():
    from virnet_tpu.train.loop_sisr import SISRTrainConfig, SISRTrainer

    cfg = SISRTrainConfig(sf=4, batch_size=16, hr_size=192,
                          save_dir="/tmp/bench_train_sisr")
    return _train_steps_per_s(SISRTrainer, cfg, (16, 192, 192, 3))


def bench_sidd_megatime():
    """Table 4 protocol: 256^2 blocks, x8 flip TTA, denoising-real arch;
    seconds of forward time per restored 1024^2 megapixel."""
    from virnet_tpu.eval.tta import tta_x8
    from virnet_tpu.models import build_model

    model = build_model("denoising-real")
    key = jax.random.PRNGKey(0)
    # batch 16 matches eval/tables.py:eval_sidd's actual block batching;
    # measured 0.293 s/MP vs 0.396 at batch 8 (the x8 TTA makes the
    # effective forward batch 128, which the chip needs for occupancy)
    batch, size = 16, 256
    x = jax.random.uniform(key, (batch, size, size, 3), jnp.float32)
    params = model.init(key, jnp.zeros((1, 64, 64, 3)))["params"]
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)

    def forward(z):
        mu, _ = model.apply({"params": params}, z.astype(jnp.bfloat16))
        return mu.astype(jnp.float32)

    def make(length):
        @jax.jit
        def fwd_n():
            def body(y, _):
                out = tta_x8(forward, y)
                return jnp.clip(out, 0.0, 1.0), 0.0
            y, _ = jax.lax.scan(body, x, None, length=length)
            return y
        return fwd_n

    sec = marginal_time(make, 2, 8)
    return sec * 1024 ** 2 / (batch * size * size)


def bench_sidd_megatime_mesh():
    """The Table-4 protocol sharded over the data mesh (the deployment
    layout, eval/engine.py mesh mode): per-device block batch 16, x8 TTA,
    batch axis sharded over ALL available devices.  Returns (aggregate
    s/MP across the mesh, n_devices); per-chip = aggregate * n_devices.
    On this relay host the mesh is 1 chip and aggregate == per-chip; on a
    v5e-8 pod the same code path reports the 8-chip aggregate — the
    executable form of the >=5x north-star claim."""
    from virnet_tpu.eval.tta import tta_x8
    from virnet_tpu.models import build_model
    from virnet_tpu.train.mesh import batch_sharded, make_mesh, replicate

    mesh = make_mesh()
    n_dev = int(mesh.devices.size)
    model = build_model("denoising-real")
    key = jax.random.PRNGKey(0)
    batch, size = 16 * n_dev, 256
    x = jax.device_put(
        jax.random.uniform(key, (batch, size, size, 3), jnp.float32),
        batch_sharded(mesh))
    params = model.init(key, jnp.zeros((1, 64, 64, 3)))["params"]
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
    params = replicate(mesh, params)

    def forward(z):
        mu, _ = model.apply({"params": params}, z.astype(jnp.bfloat16))
        return mu.astype(jnp.float32)

    def make(length):
        @jax.jit
        def fwd_n():
            def body(y, _):
                out = tta_x8(forward, y)
                return jnp.clip(out, 0.0, 1.0), 0.0
            y, _ = jax.lax.scan(body, x, None, length=length)
            return y
        return fwd_n

    sec = marginal_time(make, 2, 8)
    return sec * 1024 ** 2 / (batch * size * size), n_dev


def main():
    from bench import _chip_reachable

    if not _chip_reachable():
        print(json.dumps({"error": "TPU backend unreachable (relay down); "
                          "BENCH_FULL.json left untouched"}))
        return

    from bench import protocol_fingerprint
    from virnet_tpu import precision

    precision.set_precision("default")       # throughput path
    conditions = {
        "denoise_fwd_mps": "denoising-syn released arch, 32x256^2 bf16, "
                           "scan 6/30",
        "sisr_fwd_mps": "sisr released arch, 16x64^2 LR bf16, output px, "
                        "scan 4/16",
        "denoise_train_steps_per_s": "batch 16x128^2, scan 2/8 reps 3",
        "sisr_train_steps_per_s": "sf4, batch 16 HR 192^2, scan 2/8 reps 3",
        "sidd_megatime_s_per_mp": "denoising-real arch, 16x256^2 blocks "
                                  "x8 TTA, scan 2/8",
    }
    results = {"_protocol": protocol_fingerprint(
        reps="best-of-reps, scan lengths interleaved per rep",
        per_metric=conditions)}
    for name, fn, unit, base in [
        ("denoise_fwd_mps", bench_denoise_fwd, "MP/s",
         BASELINE["denoise_fwd_mps"]),
        ("sisr_fwd_mps", bench_sisr_fwd, "MP/s", None),
        ("denoise_train_steps_per_s", bench_denoise_train, "steps/s", None),
        ("sisr_train_steps_per_s", bench_sisr_train, "steps/s", None),
        ("sidd_megatime_s_per_mp", bench_sidd_megatime, "s/MP",
         BASELINE["sidd_megatime_s_per_mp"]),
    ]:
        value = fn()
        rec = {"metric": name, "value": round(value, 4), "unit": unit}
        if base:
            ratio = (value / base if unit != "s/MP" else base / value)
            rec["vs_baseline"] = round(ratio, 3)
        results[name] = rec
        print(json.dumps(rec), flush=True)

    agg, n_dev = bench_sidd_megatime_mesh()
    base = BASELINE["sidd_megatime_s_per_mp"]
    rec = {"metric": "sidd_megatime_mesh", "value": round(agg, 4),
           "unit": "s/MP (aggregate across mesh)",
           "per_chip_s_per_mp": round(agg * n_dev, 4),
           "n_devices": n_dev,
           "vs_baseline": round(base / agg, 3),
           "conditions": "mesh-sharded Table-4 protocol: per-device block "
                         "batch 16 x8 TTA, denoising-real arch, bf16, "
                         "scan 2/8"}
    results["sidd_megatime_mesh"] = rec
    print(json.dumps(rec), flush=True)

    with open("BENCH_FULL.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
