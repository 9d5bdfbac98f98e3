"""Benchmark: restored megapixels/sec/chip on the flagship denoiser.

Mirrors the reference's SIDD 'megatime' protocol in spirit
(scripts/denoising_virnet_real_sidd.py:127-156: wall-time per restored
megapixel on 256^2 blocks), measured as on-chip throughput.

Measurement method: this environment reaches the TPU through a relay with
~1s of fixed dispatch+fetch overhead per call and an unreliable
block_until_ready, so a naive loop measures the tunnel, not the chip.  We
instead jit a lax.scan of N chained model applications (one dispatch, one
fetch) at two scan lengths and report the MARGINAL rate
(N2-N1)*MP/(t2-t1) — pure on-chip compute, the number a production TPU VM
would see.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` divides by the documented A100-PyTorch estimate of
15.6 MP/s (BASELINE.md "A100-PyTorch baseline estimate": 4.99 TFLOP/MP by
the reference's own thop protocol, A100 TF32 peak 156 TFLOP/s at a
generous 50% eager utilization).  Breadth metrics (SISR forward, train
steps/s, SIDD megatime) live in bench_full.py, recorded in BASELINE.md.
"""

import json
import subprocess
import sys
import time
from pathlib import Path

# last successful bench result, refreshed on every good run: a transient
# relay blip at round end must not zero the round artifact (VERDICT r4
# weak #1 — BENCH_r04 recorded 0.0 during an outage while the in-round
# number was 23.56 MP/s).  On final unreachability the bench emits this
# with an explicit ``stale: true`` marker instead of 0.0.
LAST_GOOD = Path(__file__).resolve().parent / "BENCH_LAST_GOOD.json"


def _probe_once(timeout_s: float) -> bool:
    code = ("import jax, jax.numpy as jnp, numpy as np; "
            "np.asarray(jnp.ones((4, 4)) * 2); print('CHIP-OK')")
    try:
        out = subprocess.run([sys.executable, "-c", code],
                             timeout=timeout_s, capture_output=True,
                             text=True)
        return out.returncode == 0 and "CHIP-OK" in out.stdout
    except subprocess.TimeoutExpired:
        return False


def _chip_reachable(timeout_s: float = 240.0, attempts: int = 3,
                    backoff_s: float = 60.0) -> bool:
    """Probe the TPU backend in a bounded subprocess, with retry.

    When the axon relay is unreachable, backend init hangs ~20 min in a
    socket retry loop; without this guard the whole bench would hang
    instead of reporting.  Relay blips are often shorter than a round's
    bench window, so a failed probe retries (3 probes spread over ~5
    min) before declaring the chip down.  The per-probe timeout covers
    a COLD relay: first contact after an idle period has been observed
    to take ~230 s while later contacts take seconds.
    """
    for i in range(attempts):
        if _probe_once(timeout_s):
            return True
        if i + 1 < attempts:
            print(f"bench: probe {i + 1}/{attempts} failed; retrying in "
                  f"{backoff_s:.0f}s", file=sys.stderr, flush=True)
            time.sleep(backoff_s)
    return False


def _git_rev() -> str:
    try:
        out = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             capture_output=True, text=True, timeout=10)
        return out.stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def protocol_fingerprint(**conditions) -> dict:
    """Provenance block embedded in every BENCH output (VERDICT r3 item 4:
    a reader must be able to reconstruct a number's conditions from the
    JSON alone, so protocol changes are distinguishable from chip
    regressions)."""
    import jax

    fp = {
        "method": "marginal-scan (see bench.py docstring)",
        "git": _git_rev(),
        "jax": jax.__version__,
        "device": jax.devices()[0].device_kind,
    }
    fp.update(conditions)
    return fp


def main():
    if not _chip_reachable():
        err = ("TPU backend unreachable (relay down) after 3 probes over "
               "~5 min; last measured values in BENCH_FULL.json / "
               "BASELINE.md")
        if LAST_GOOD.exists():
            # emit the last-known-good measurement, explicitly marked
            # stale, rather than zeroing the round artifact
            rec = json.loads(LAST_GOOD.read_text())
            rec["stale"] = True
            rec["error"] = err
            print(json.dumps(rec))
            return
        print(json.dumps({
            "metric": "restored_megapixels_per_sec_per_chip",
            "value": 0.0, "unit": "MP/s", "vs_baseline": 0.0,
            "error": err,
        }))
        return

    import jax
    import jax.numpy as jnp
    import numpy as np

    from virnet_tpu.models import build_model
    from virnet_tpu import precision
    # throughput path: bf16 weights + activations
    precision.set_precision("default")

    model = build_model("denoising-syn")
    key = jax.random.PRNGKey(0)
    batch, size = 32, 256
    x = jax.random.uniform(key, (batch, size, size, 3), jnp.float32)
    params = model.init(key, jnp.zeros((1, 64, 64, 3)))["params"]
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)

    def make_scan(length):
        @jax.jit
        def fwd_n(params, x):
            def body(y, _):
                mu, _sig = model.apply({"params": params},
                                       y.astype(jnp.bfloat16))
                return jnp.clip(mu, 0.0, 1.0).astype(jnp.float32), 0.0
            y, _ = jax.lax.scan(body, x, None, length=length)
            return y
        return fwd_n

    n1, n2 = 6, 30
    f1, f2 = make_scan(n1), make_scan(n2)
    np.asarray(f1(params, x))            # compile + warm
    np.asarray(f2(params, x))

    # best-of-5 with the two scan lengths INTERLEAVED per rep: the dev
    # pool is shared, and timing all N1 reps then all N2 reps lets a
    # co-tenant burst cover one phase only, which skews the marginal
    # delta (observed: a +30% outlier when the N1 phase alone was
    # contended).  Interleaving spreads both lengths over the same
    # window; the per-rep deltas go into the fingerprint for audit.
    t1 = t2 = float("inf")
    deltas = []
    for _ in range(5):
        tic = time.perf_counter()
        np.asarray(f1(params, x))        # host fetch = true sync
        mid = time.perf_counter()
        np.asarray(f2(params, x))
        end = time.perf_counter()
        t1 = min(t1, mid - tic)
        t2 = min(t2, end - mid)
        deltas.append((end - mid) - (mid - tic))
    mp = batch * size * size / 1e6
    mps = (n2 - n1) * mp / (t2 - t1)

    # A100-PyTorch estimate, derivation in BASELINE.md: 156 TFLOP/s TF32
    # peak x 50% eager utilization / 4.99 TFLOP per restored megapixel
    baseline_mps = 15.6
    result = {
        "metric": "restored_megapixels_per_sec_per_chip",
        "value": round(mps, 3),
        "unit": "MP/s",
        "vs_baseline": round(mps / baseline_mps, 3),
        "protocol": protocol_fingerprint(
            arch="denoising-syn released preset (testing_demo.py:23-33)",
            batch=batch, block=size,
            dtype="bf16 weights+activations, fp32 in/out",
            scan_lengths=[n1, n2], reps="best-of-5 interleaved",
            per_rep_delta_ms=[round(d / (n2 - n1) * 1e3, 2)
                              for d in deltas],
            baseline="A100 estimate 15.6 MP/s (BASELINE.md)"),
    }
    # refresh the stale-fallback record (see LAST_GOOD above)
    try:
        rec = dict(result)
        rec["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%S%z")
        LAST_GOOD.write_text(json.dumps(rec, indent=1))
    except OSError:
        pass
    print(json.dumps(result))


if __name__ == "__main__":
    main()
