"""Bounded-memory audit for the multi-day training regime.

The round-4 multi-hour run (BASELINE.md) logged host RSS growing ~3.6 GB
-> ~8 GB over 4 h with flat throughput; this tool attributes and bounds
that growth (VERDICT r4 item 4).  It mirrors the multi-hour loop shape —
device-resident data, jitted train steps, per-epoch fixed-seed val +
TensorBoard scalars/grids + orbax checkpoint — at a configurable scale,
and samples a memory breakdown every epoch:

  * RSS / VmHWM (/proc/self/status) — what the mh run observed growing
  * live jax device/host array bytes (jax.live_arrays) — XLA-side state
  * tracemalloc total — PYTHON-owned allocations (a live Python leak
    shows here; glibc heap retention does not)
  * rss_after_trim — RSS after ctypes malloc_trim(0): the drop is heap
    that was FREE but unreturned (glibc arena caching/fragmentation,
    the classic multi-threaded-host growth that is not a leak)

Ablations isolate subsystems: --no_tb / --no_ckpt / --no_val, and
--trim_every N trims the glibc heap every N epochs to test the
mitigation.  Run on the CPU platform for attribution (all the suspect
subsystems are host-side; the axon relay client is the one chip-only
suspect and is external code):

    VIRNET_TPU_PLATFORM=cpu python tools/mem_audit.py \
        --epochs 30 --steps 200 --out /tmp/mem_audit.jsonl

Reference regime being gated: train_denoising_syn.py:125,158 (120
epochs x 10k iters).
"""

from __future__ import annotations

import argparse
import ctypes
import gc
import json
import sys
import time
import tracemalloc
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _proc_status_kb(field: str) -> int:
    for line in Path("/proc/self/status").read_text().splitlines():
        if line.startswith(field + ":"):
            return int(line.split()[1])
    return -1


def malloc_trim() -> bool:
    """Return unused glibc heap to the kernel.  Returns False when libc
    has no malloc_trim (non-glibc)."""
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.malloc_trim(0)
        return True
    except (OSError, AttributeError):
        return False


def live_jax_bytes() -> int:
    import jax

    return sum(int(getattr(a, "nbytes", 0)) for a in jax.live_arrays())


def sample(tag: str, epoch: int, with_trim: bool) -> dict:
    gc.collect()
    rec = {
        "tag": tag, "epoch": epoch, "t": round(time.time(), 1),
        "rss_mb": round(_proc_status_kb("VmRSS") / 1024, 1),
        "hwm_mb": round(_proc_status_kb("VmHWM") / 1024, 1),
        "jax_live_mb": round(live_jax_bytes() / 1e6, 1),
        "py_traced_mb": round(tracemalloc.get_traced_memory()[0] / 1e6, 1),
        "gc_objects": len(gc.get_objects()),
    }
    if with_trim:
        malloc_trim()
        rec["rss_after_trim_mb"] = round(_proc_status_kb("VmRSS") / 1024, 1)
    return rec


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--patch", type=int, default=64)
    ap.add_argument("--arch", choices=("tiny", "released"), default="tiny",
                    help="tiny = fast steps for long CPU audits; released "
                         "= the mh run's arch (chip audits)")
    ap.add_argument("--no_tb", action="store_true")
    ap.add_argument("--no_ckpt", action="store_true")
    ap.add_argument("--no_val", action="store_true")
    ap.add_argument("--trim_every", type=int, default=0,
                    help="malloc_trim every N epochs (0 = only at the "
                         "sampling probe)")
    ap.add_argument("--probe_trim", action="store_true",
                    help="sample rss_after_trim each epoch (attributes "
                         "free-but-unreturned heap)")
    ap.add_argument("--out", type=str, default="/tmp/mem_audit.jsonl")
    ap.add_argument("--save_dir", type=str, default="/tmp/mem_audit_run")
    ap.add_argument("--val_images", type=int, default=4)
    args = ap.parse_args(argv)

    tracemalloc.start()

    import numpy as np

    from virnet_tpu.cli.common import (eval_on_pairs, eval_restore_fn,
                                       log_val_image_grids)
    from virnet_tpu.data.device_data import DeviceDataset
    from virnet_tpu.train.logging import TrainWriter, make_log
    from virnet_tpu.train.loop_denoise import (DenoiseTrainConfig,
                                               DenoiseTrainer)

    logger = make_log(None)
    arch = (dict(sigma_chn=1, dep_S=3, n_feat=(16, 32), n_resblocks=1)
            if args.arch == "tiny" else
            dict(sigma_chn=1, dep_S=5, n_feat=(96, 192, 288),
                 n_resblocks=3))
    cfg = DenoiseTrainConfig(
        batch_size=args.batch, patch_size=args.patch, epochs=args.epochs,
        warmup_epochs=2, steps_per_epoch=args.steps,
        save_dir=args.save_dir, print_freq=10 ** 9, **arch)
    trainer = DenoiseTrainer(cfg)

    # device-resident synthetic GT records (the mh run's data mode; no
    # file IO so the audit isolates the training-loop subsystems)
    rng = np.random.default_rng(0)
    recs = rng.integers(0, 256, (64, 128, 128, 3), dtype=np.uint8)
    dataset = DeviceDataset(trainer.mesh, recs)

    writer = None if args.no_tb else TrainWriter(Path(args.save_dir) / "logs")
    val_pairs = None
    if not args.no_val:
        gt = rng.random((args.val_images, 160, 160, 3), dtype=np.float32)
        noisy = np.clip(gt + rng.normal(0, 25 / 255, gt.shape), 0, 1) \
            .astype(np.float32)
        val_pairs = list(zip(noisy, gt))

    out = Path(args.out)
    out.write_text("")

    def emit(rec):
        with out.open("a") as f:
            f.write(json.dumps(rec) + "\n")
        if rec["tag"] == "summary":
            logger.info(json.dumps(rec))
            return
        logger.info(
            f"[{rec['tag']} ep{rec['epoch']:>3}] rss {rec['rss_mb']:.0f} MB"
            + (f" (trimmed {rec['rss_after_trim_mb']:.0f})"
               if "rss_after_trim_mb" in rec else "")
            + f", jax {rec['jax_live_mb']:.0f} MB, "
              f"py {rec['py_traced_mb']:.0f} MB, "
              f"gc {rec['gc_objects']}")

    emit(sample("start", -1, args.probe_trim))
    for epoch in range(args.epochs):
        stats = trainer.train_epoch_device(epoch, dataset, args.steps,
                                           log_fn=None)
        if writer is not None:
            writer.scalar("Loss_epoch", stats.get("loss", 0.0), epoch)
        if val_pairs is not None:
            restore = eval_restore_fn(trainer.model, trainer.params,
                                      pad_multiple=32)
            metrics = eval_on_pairs(restore, iter(val_pairs))
            if writer is not None:
                writer.scalar("PSNR_epoch_test", metrics["psnr"], epoch)
                log_val_image_grids(writer, restore, iter(val_pairs), epoch)
        if not args.no_ckpt:
            trainer.save(epoch)
        if args.trim_every and (epoch + 1) % args.trim_every == 0:
            malloc_trim()
        emit(sample("epoch", epoch, args.probe_trim))

    # summary: slope over the post-warmup tail (first 20% discarded)
    recs = [json.loads(ln) for ln in out.read_text().splitlines()]
    tail = [r for r in recs if r["epoch"] >= args.epochs // 5]
    if len(tail) >= 2:
        dt_h = (tail[-1]["t"] - tail[0]["t"]) / 3600
        summary = {
            "tag": "summary",
            "epochs": args.epochs, "steps_per_epoch": args.steps,
            "ablation": {"tb": not args.no_tb, "ckpt": not args.no_ckpt,
                         "val": not args.no_val,
                         "trim_every": args.trim_every},
            "rss_start_mb": recs[0]["rss_mb"],
            "rss_end_mb": tail[-1]["rss_mb"],
            "rss_slope_mb_per_h": round(
                (tail[-1]["rss_mb"] - tail[0]["rss_mb"]) / max(dt_h, 1e-9),
                1),
            "py_slope_mb_per_h": round(
                (tail[-1]["py_traced_mb"] - tail[0]["py_traced_mb"])
                / max(dt_h, 1e-9), 1),
            "gc_growth": tail[-1]["gc_objects"] - tail[0]["gc_objects"],
            "wall_min": round((recs[-1]["t"] - recs[0]["t"]) / 60, 1),
        }
        if "rss_after_trim_mb" in tail[-1]:
            summary["rss_trimmed_end_mb"] = tail[-1]["rss_after_trim_mb"]
        emit(summary)
        print(json.dumps(summary))


if __name__ == "__main__":
    main()
