"""Real-noise (SIDD) denoising trainer CLI (reference
train_denoising_real.py).

    python -m virnet_tpu.cli.train_denoising_real \
        --config configs/denoising_real.json --save_dir ./run1

Paired noisy/GT patches come from a SIDD-style folder pair
(<root>/noisy/*.png, <root>/gt/*.png); MixUp and the σ²-prior residual
filter run in-graph; per-epoch validation on the SIDD ValidationBlocks
.mat pair.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..config import as_bool
from ..data.sources import PairedPatchSampler
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
        epochs=cfg["epochs"], warmup_epochs=cfg.get("warmup_epochs", 10),
        steps_per_epoch=cfg.get("steps_per_epoch", 10000),
        lr=cfg["lr"], lr_min=cfg.get("lr_min", 1e-6),
        clip_grad_R=cfg.get("clip_grad_R", 5e2),
        clip_grad_S=cfg.get("clip_grad_S", 1e2),
        eps2=cfg.get("eps2", 1e-6), var_window=cfg.get("var_window", 7),
        use_mixup=as_bool(cfg.get("use_mixup", True)),
        mixed_precision=as_bool(cfg.get("mixed_precision", True)),
        remat=as_bool(cfg.get("remat", False)),
        save_dir=cfg["save_dir"], print_freq=cfg.get("print_freq", 100))
    return DenoiseTrainer(tcfg, real=True)


def sidd_val_pairs(noisy_mat: str, gt_mat: str):
    """Yield (noisy, gt) float32 HWC pairs from the SIDD validation .mats
    (reference datasets/DenoisingDatasets.py:157-177)."""
    from scipy.io import loadmat

    noisy = loadmat(noisy_mat)["ValidationNoisyBlocksSrgb"]
    gt = loadmat(gt_mat)["ValidationGtBlocksSrgb"]
    h, w, c = noisy.shape[2:]
    noisy = noisy.reshape(-1, h, w, c)
    gt = gt.reshape(-1, h, w, c)
    for i in range(noisy.shape[0]):
        yield (noisy[i].astype(np.float32) / 255.0,
               gt[i].astype(np.float32) / 255.0)


def main(argv=None):
    args = trainer_argparser("configs/denoising_real.json").parse_args(argv)
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
        cfg, "virnet_tpu.cli.train_denoising_real", argv, logger, writer)

    dataset = sampler = None
    if as_bool(cfg.get("device_data", False)):
        # device-resident records: upload once, sample/crop/augment inside
        # the jitted step (data/device_data.py) — zero host bytes per step
        if not cfg.get("train_pack_file"):
            raise ValueError("device_data=true needs train_pack_file "
                             "(fixed-size records); pack folders with "
                             "data/packdb.pack_from_folders or convert "
                             "LMDB via data/lmdb_convert")
        from ..data.device_data import DeviceDataset
        dataset = DeviceDataset.from_packdb(trainer.mesh,
                                            cfg["train_pack_file"])
        logger.info(f"Device-resident records: {dataset.num_records} x "
                    f"{dataset.rec_shape}")
    elif cfg.get("train_pack_file"):
        # native mmap'd pack file + C++ threaded sampler (data/packdb.py)
        from ..data.packdb import PackDBSampler
        sampler = PackDBSampler(cfg["train_pack_file"], cfg["patch_size"])
        logger.info(f"Number of training records (packdb): {len(sampler)}")
    else:
        sampler = PairedPatchSampler(cfg["train_pch_dir"], cfg["patch_size"])
        logger.info(f"Number of training patch pairs: {len(sampler.noisy)}")

    have_val = (Path(cfg["test_noisy_path"]).exists()
                and Path(cfg["test_gt_path"]).exists())

    steps = cfg.get("steps_per_epoch", 10000)

    def run_epochs(epoch_start):
      for epoch in range(epoch_start, cfg["epochs"]):
          if dataset is not None:
              stats = trainer.train_epoch_device(epoch, dataset, steps,
                                                 log_fn=logger.info)
          else:
              sampler.reset_seed(epoch)

              def batches():
                  # uint8 pairs to the device; normalized in-graph
                  for _ in range(steps):
                      yield sampler.sample(cfg["batch_size"], raw=True)

              stats = trainer.train_epoch(epoch, batches(),
                                          log_fn=logger.info)
          writer.scalar("Loss_epoch", stats.get("loss", 0.0), epoch)

          if have_val:
              restore = eval_restore_fn(trainer.model, trainer.params)
              metrics = eval_on_pairs(
                  restore, sidd_val_pairs(cfg["test_noisy_path"],
                                          cfg["test_gt_path"]))
              logger.info(f"test: PSNR={metrics['psnr']:4.2f}, "
                          f"SSIM={metrics['ssim']:5.4f}")
              writer.scalar("PSNR_epoch_test", metrics["psnr"], epoch)
              writer.scalar("SSIM_epoch_test", metrics["ssim"], epoch)
              log_val_image_grids(
                  writer, restore,
                  sidd_val_pairs(cfg["test_noisy_path"],
                                 cfg["test_gt_path"]), epoch)

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
