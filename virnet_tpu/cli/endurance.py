"""Input-pipeline endurance run: drive a trainer at full speed for N
minutes and measure whether the host data path can feed the chip.

The reference feeds its hot loop from torch DataLoader worker processes
(train_denoising_real.py:125-139); our equivalent is the native C++ mmap
packdb sampler (data/packdb.py + native/packdb.cpp) with synthesis on
device.  This CLI answers the question the one-off benches can't: over a
sustained run, what fraction of wall time is spent waiting on the host
input path vs. on-device compute?

    python -m virnet_tpu.cli.endurance --minutes 30 --mode real
    python -m virnet_tpu.cli.endurance --minutes 5 --mode syn

Prints a JSON summary line; record results in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


def _make_pack(path: Path, n_records: int, size: int, paired: bool):
    """Synthetic SIDD-like pack (256^2 uint8 patch pairs)."""
    from ..data.packdb import write_packdb

    rng = np.random.default_rng(0)
    gt = rng.integers(0, 256, (n_records, size, size, 3), dtype=np.uint8)
    noisy = np.clip(gt.astype(np.int16) +
                    rng.normal(0, 10, gt.shape).astype(np.int16),
                    0, 255).astype(np.uint8)
    write_packdb(path, noisy, gt if paired else None)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--minutes", type=float, default=30.0)
    p.add_argument("--mode", choices=["real", "syn"], default="real")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--patch_size", type=int, default=128)
    p.add_argument("--pack_records", type=int, default=2000)
    p.add_argument("--pack_path", type=str, default="")
    p.add_argument("--num_threads", type=int, default=0,
                   help="packdb sampler threads (0 = auto)")
    p.add_argument("--sync_every", type=int, default=50,
                   help="steps between host fetches (true sync points)")
    p.add_argument("--prefetch", type=int, default=2,
                   help="async input prefetch depth (0 = synchronous "
                        "sample+upload, the round-2 behavior)")
    p.add_argument("--device_data", action="store_true",
                   help="device-resident dataset: upload the pack to HBM "
                        "once, sample/crop/augment inside the jitted step "
                        "(data/device_data.py) — zero host bytes per step")
    p.add_argument("--save_dir", type=str, default="/tmp/virnet_endurance")
    args = p.parse_args(argv)

    from ..data.packdb import PackDBSampler
    from ..train.loop_denoise import DenoiseTrainConfig, DenoiseTrainer

    pack_path = Path(args.pack_path or
                     Path(args.save_dir) / "endurance_pack.bin")
    pack_path.parent.mkdir(parents=True, exist_ok=True)
    if not pack_path.exists():
        print(f"building synthetic pack ({args.pack_records} x 256^2) ...",
              flush=True)
        _make_pack(pack_path, args.pack_records, 256,
                   paired=(args.mode == "real"))

    sampler = PackDBSampler(pack_path, args.patch_size,
                            num_threads=args.num_threads)

    real = args.mode == "real"
    arch = (dict(sigma_chn=3, dep_S=8, n_feat=(96, 160, 224, 288),
                 n_resblocks=3) if real
            else dict(sigma_chn=1, dep_S=5, n_feat=(96, 192, 288),
                      n_resblocks=3))
    cfg = DenoiseTrainConfig(batch_size=args.batch_size,
                             patch_size=args.patch_size,
                             save_dir=args.save_dir, **arch)
    trainer = DenoiseTrainer(cfg, real=real)

    # warm up / compile outside the measured window.  Batches go to the
    # device as uint8 (normalized in-graph): on this 1-core dev host the
    # float32 upload through the relay dominated wall time (90% "input"
    # wait at 3.7 steps/s); uint8 cuts the transfer 4x.
    dataset = None
    if args.device_data:
        from ..data.device_data import DeviceDataset
        dataset = DeviceDataset.from_packdb(trainer.mesh, pack_path)
        aux = trainer.run_step_device(dataset, epoch=0)
    else:
        batch = sampler.sample(args.batch_size, raw=True)
        aux = trainer.run_step(batch, epoch=0)
    _ = float(aux["loss"])

    deadline = time.perf_counter() + args.minutes * 60.0
    input_time = 0.0
    steps = 0
    t_start = time.perf_counter()
    last_loss = float("nan")
    prefetcher = None
    if args.device_data:
        get_batch = lambda: None  # noqa: E731 — input path has no host work
    elif args.prefetch > 0:
        # async path: a background thread samples + uploads batch N+1
        # while step N runs; "input" time is then the wall the *consumer*
        # spends blocked on the queue (pure overlap shows ~0)
        from ..data.prefetch import DevicePrefetcher

        def batches():
            while True:
                yield sampler.sample(args.batch_size, raw=True)

        prefetcher = DevicePrefetcher(batches(), trainer.mesh,
                                      depth=args.prefetch)
        get_batch = prefetcher.__next__
    else:
        get_batch = lambda: sampler.sample(args.batch_size, raw=True)  # noqa: E731
    while time.perf_counter() < deadline:
        t0 = time.perf_counter()
        batch = get_batch()
        input_time += time.perf_counter() - t0
        aux = (trainer.run_step_device(dataset, epoch=0) if args.device_data
               else trainer.run_step(batch, epoch=0))
        steps += 1
        if steps % args.sync_every == 0:
            last_loss = float(aux["loss"])      # host fetch = sync point
            elapsed = time.perf_counter() - t_start
            print(f"step {steps:6d}  {steps / elapsed:6.2f} steps/s  "
                  f"input {100 * input_time / elapsed:5.2f}%  "
                  f"loss {last_loss:.1f}", flush=True)
    last_loss = float(aux["loss"])
    total = time.perf_counter() - t_start
    if prefetcher is not None:
        prefetcher.close()

    summary = {
        "metric": "endurance",
        "mode": args.mode,
        "prefetch": args.prefetch,
        "device_data": bool(args.device_data),
        "minutes": round(total / 60.0, 2),
        "steps": steps,
        "steps_per_s": round(steps / total, 3),
        "input_fraction": round(input_time / total, 4),
        "final_loss_finite": bool(np.isfinite(last_loss)),
    }
    print(json.dumps(summary))
    sampler.close()
    return summary


if __name__ == "__main__":
    main()
