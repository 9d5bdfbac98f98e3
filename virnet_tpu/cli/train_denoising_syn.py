"""Synthetic-denoising trainer CLI (reference train_denoising_syn.py).

    python -m virnet_tpu.cli.train_denoising_syn \
        --config configs/denoising_syn.json --save_dir ./run1

Data flow (TPU-first): the host serves GT patch batches from a RAM image
cache; σ-maps and noise are synthesized inside the jitted sharded train
step.  Per-epoch: fixed-seed validation on CBSD68 (reference
SimulateTest protocol), orbax checkpoint, TensorBoard scalars/images.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..config import as_bool
from ..data.eval_sets import DenoiseValSet
from ..data.sources import ImageCache, PatchSampler, glob_images
from ..train.logging import TrainWriter, make_log
from ..train.loop_denoise import DenoiseTrainConfig, DenoiseTrainer
from .common import (epoch_rss_watchdog, eval_on_pairs, eval_restore_fn,
                     load_trainer_config, log_val_image_grids,
                     maybe_init_multihost, trainer_argparser)


def build_trainer(cfg: dict) -> DenoiseTrainer:
    tcfg = DenoiseTrainConfig(
        im_chn=cfg["im_chn"], sigma_chn=cfg["sigma_chn"],
        dep_S=cfg["dep_S"], n_feat=tuple(cfg["n_feat"]),
        n_resblocks=cfg["n_resblocks"],
        noise_cond=as_bool(cfg.get("noise_cond", True)),
        extra_mode=str(cfg.get("extra_mode", "Input")).lower(),
        batch_size=cfg["batch_size"], patch_size=cfg["patch_size"],
        epochs=cfg["epochs"], warmup_epochs=cfg.get("warmup_epochs", 5),
        steps_per_epoch=cfg.get("steps_per_epoch", 10000),
        lr=cfg["lr"], lr_min=cfg.get("lr_min", 1e-6),
        clip_grad_R=cfg.get("clip_grad_R", 1e3),
        clip_grad_S=cfg.get("clip_grad_S", 1e2),
        eps2=cfg.get("eps2", 1e-6), var_window=cfg.get("var_window", 7),
        noise_mode=cfg.get("noise_mode", "niid"),
        mixed_precision=as_bool(cfg.get("mixed_precision", True)),
        remat=as_bool(cfg.get("remat", False)),
        save_dir=cfg["save_dir"], print_freq=cfg.get("print_freq", 100))
    return DenoiseTrainer(tcfg)


def main(argv=None):
    args = trainer_argparser("configs/denoising_syn.json").parse_args(argv)
    cfg = load_trainer_config(args)
    save_dir = Path(cfg["save_dir"])
    save_dir.mkdir(parents=True, exist_ok=True)
    logger = make_log(save_dir / "train.log")
    for k, v in sorted(cfg.items()):
        logger.info(f"{k:<16s}: {v}")

    maybe_init_multihost(cfg, logger.info)
    trainer = build_trainer(cfg)
    writer = TrainWriter(save_dir / "logs")
    rss_check = epoch_rss_watchdog(
        cfg, "virnet_tpu.cli.train_denoising_syn", argv, logger, writer)

    # training data: union of configured (dir, glob) sources
    train_paths = glob_images(*[tuple(x) for x in cfg["train_data"]])
    if not train_paths:
        raise SystemExit("no training images found — check train_data paths")
    logger.info(f"Number of training images: {len(train_paths)}")
    dataset = sampler = None
    if as_bool(cfg.get("device_data", False)):
        # device-resident GT records: one-time host crop + upload, then
        # sampling/crop/augment runs inside the jitted step
        from ..data.device_data import DeviceDataset, records_from_images
        recs = records_from_images(
            train_paths, int(cfg.get("device_record_size", 256)),
            per_image=int(cfg.get("device_records_per_image", 8)))
        dataset = DeviceDataset(trainer.mesh, recs)
        logger.info(f"Device-resident GT records: {dataset.num_records} x "
                    f"{dataset.rec_shape}")
    else:
        cache = ImageCache(train_paths)
        sampler = PatchSampler(cache, cfg["patch_size"])

    # validation data (fixed-seed synthesis)
    val_paths = sorted(str(p) for p in Path(cfg["val_data"]).glob("*.png"))
    val_set = DenoiseValSet(val_paths) if val_paths else None

    steps = cfg.get("steps_per_epoch", 10000)

    def run_epochs(epoch_start):
      for epoch in range(epoch_start, cfg["epochs"]):
          if dataset is not None:
              stats = trainer.train_epoch_device(epoch, dataset, steps,
                                                 log_fn=logger.info)
          else:
              sampler.reset_seed(epoch)

              def batches():
                  # uint8 to the device; the trainer normalizes in-graph
                  for _ in range(steps):
                      yield sampler.sample(cfg["batch_size"], raw=True)

              stats = trainer.train_epoch(epoch, batches(),
                                          log_fn=logger.info)
          writer.scalar("Loss_epoch", stats.get("loss", 0.0), epoch)
          logger.info(f"train: Loss={stats.get('loss', 0):+.2e}, "
                      f"lh={stats.get('lh', 0):+.2e}, "
                      f"KLG={stats.get('kl_gauss', 0):+.2e}, "
                      f"KLIG={stats.get('kl_ig', 0):+.2e}")

          if val_set is not None:
              restore = eval_restore_fn(trainer.model, trainer.params)
              metrics = eval_on_pairs(restore, iter(val_set))
              logger.info(f"test: PSNR={metrics['psnr']:4.2f}, "
                          f"SSIM={metrics['ssim']:5.4f}")
              writer.scalar("PSNR_epoch_test", metrics["psnr"], epoch)
              writer.scalar("SSIM_epoch_test", metrics["ssim"], epoch)
              log_val_image_grids(writer, restore, iter(val_set), epoch)

          trainer.save(epoch)
          logger.info(f"epoch {epoch + 1} took {stats['epoch_time']:.2f}s")
          rss_check()

    if cfg.get("auto_resume"):
        from ..train.resilience import run_with_auto_resume
        run_with_auto_resume(run_epochs, trainer.restore,
                             log_fn=logger.info)
    else:
        run_epochs(trainer.restore() if cfg.get("resume") else 0)

    writer.close()


if __name__ == "__main__":
    main()
