"""Blind-SISR trainer CLI (reference train_SISR.py).

    python -m virnet_tpu.cli.train_sisr \
        --config configs/sisr_x4.json --save_dir ./run1

HR patches stream from a RAM cache; the whole degradation pipeline runs
inside the jitted train step.  Per-epoch validation on Set14 (Gaussian and,
when add_jpeg, JPEG noise types) with Y-channel metrics and border = sf,
plus kernel-image TensorBoard summaries.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..config import as_bool
from ..data.eval_sets import SISRValSet
from ..data.sources import ImageCache, PatchSampler
from ..train.logging import TrainWriter, make_log
from ..train.loop_sisr import SISRTrainConfig, SISRTrainer
from .common import (epoch_rss_watchdog, eval_on_pairs, eval_restore_fn,
                     load_trainer_config, log_val_image_grids,
                     maybe_init_multihost, trainer_argparser)


def build_trainer(cfg: dict) -> SISRTrainer:
    tcfg = SISRTrainConfig(
        im_chn=cfg["im_chn"], sigma_chn=cfg["sigma_chn"],
        dep_S=cfg["dep_S"], dep_K=cfg["dep_K"], n_feat=tuple(cfg["n_feat"]),
        n_resblocks=cfg["n_resblocks"],
        extra_mode=str(cfg.get("extra_mode", "Both")).lower(),
        noise_cond=as_bool(cfg.get("noise_cond", True)),
        kernel_cond=as_bool(cfg.get("kernel_cond", True)),
        sf=cfg["sf"], k_size=cfg.get("k_size", 21),
        kernel_shift=as_bool(cfg.get("kernel_shift", False)),
        downsampler=str(cfg.get("downsampler", "Bicubic")).lower(),
        noise_level=tuple(cfg.get("noise_level", (0.01, 15))),
        batch_size=cfg["batch_size"], hr_size=cfg["hr_size"],
        epochs=cfg["epochs"], warmup_epochs=cfg.get("warmup_epochs", 0),
        steps_per_epoch=cfg.get("steps_per_epoch", 10000),
        lr=cfg["lr"], lr_min=cfg.get("lr_min", 1e-6),
        clip_grad_R=cfg.get("clip_grad_R", 5e2),
        clip_grad_S=cfg.get("clip_grad_S", 1e2),
        clip_grad_K=cfg.get("clip_grad_K", 5e2),
        eps2=cfg.get("eps2", 1e-5), r2=cfg.get("r2", 1e-4),
        var_window=cfg.get("var_window", 9),
        kappa0=cfg.get("kappa0", 50),
        penalty_K=tuple(cfg.get("penalty_K", (0.02, 2))),
        mixed_precision=as_bool(cfg.get("mixed_precision", True)),
        remat=as_bool(cfg.get("remat", False)),
        add_jpeg_in_graph=(as_bool(cfg.get("add_jpeg", False))
                           and as_bool(cfg.get("jpeg_in_graph", False))),
        noise_jpeg=tuple(cfg.get("noise_jpeg", (0.1, 10))),
        save_dir=cfg["save_dir"], print_freq=cfg.get("print_freq", 100))
    # JPEG noise: exact libjpeg round trips need the host degradation
    # path; jpeg_in_graph=true instead uses the device-side DCT codec
    # (ops/jpeg.py) and keeps the whole degradation in the jitted step
    # (device_data-compatible)
    host_batches = (as_bool(cfg.get("add_jpeg", False))
                    and not as_bool(cfg.get("jpeg_in_graph", False)))
    return SISRTrainer(tcfg, host_batches=host_batches)


def main(argv=None):
    args = trainer_argparser("configs/sisr_x4.json").parse_args(argv)
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
        cfg, "virnet_tpu.cli.train_sisr", argv, logger, writer)
    sf = cfg["sf"]

    hr_paths = sorted(str(p) for p in
                      Path(cfg["train_hr_patchs"]).glob("*.png"))
    if not hr_paths:
        raise SystemExit("no HR patches found — check train_hr_patchs")
    logger.info(f"Number of HR patches: {len(hr_paths)}")
    dataset = None
    if as_bool(cfg.get("device_data", False)):
        if trainer.host_batches:
            raise SystemExit("device_data is incompatible with the JPEG "
                             "noise branch (host-side libjpeg)")
        from ..data.device_data import DeviceDataset, records_from_images
        recs = records_from_images(
            hr_paths,
            int(cfg.get("device_record_size", max(cfg["hr_size"], 256))),
            per_image=int(cfg.get("device_records_per_image", 4)))
        dataset = DeviceDataset(trainer.mesh, recs)
        logger.info(f"Device-resident HR records: {dataset.num_records} x "
                    f"{dataset.rec_shape}")
    cache = ImageCache(hr_paths)
    if trainer.host_batches:
        from ..data.sisr_host import HostSISRSampler
        sampler = HostSISRSampler(
            cache, cfg["hr_size"], sf, k_size=cfg.get("k_size", 21),
            kernel_shift=as_bool(cfg.get("kernel_shift", False)),
            downsampler=str(cfg.get("downsampler", "Bicubic")).lower(),
            noise_level=tuple(cfg.get("noise_level", (0.1, 15))),
            noise_jpeg=tuple(cfg.get("noise_jpeg", (0.1, 10))),
            add_jpeg=True)
    else:
        sampler = PatchSampler(cache, cfg["hr_size"])

    # validation sets per noise type (reference train_SISR.py:277-321)
    noise_types = ["Gaussian"]
    if as_bool(cfg.get("add_jpeg", False)):
        noise_types.append("JPEG")
    val_root = Path(cfg["val_hr_path"])
    val_paths = sorted(str(p) for p in val_root.glob("*.bmp")) or \
        sorted(str(p) for p in val_root.glob("*.png"))
    val_sets = {
        nt: SISRValSet(val_paths, sf=sf, k_size=cfg.get("k_size", 21),
                       kernel_shift=as_bool(cfg.get("kernel_shift", False)),
                       downsampler=str(cfg.get("downsampler",
                                               "Bicubic")).lower(),
                       noise_type=nt)
        for nt in noise_types
    } if val_paths else {}

    steps = cfg.get("steps_per_epoch", 10000)

    def run_epochs(epoch_start):
      for epoch in range(epoch_start, cfg["epochs"]):
          if dataset is not None:
              stats = trainer.train_epoch_device(epoch, dataset, steps,
                                                 log_fn=logger.info)
          else:
              sampler.reset_seed(epoch * 1000)

              raw = not trainer.host_batches   # HostSISRSampler degrades
              def batches():                   # in float
                  for _ in range(steps):
                      yield (sampler.sample(cfg["batch_size"], raw=True)
                             if raw else sampler.sample(cfg["batch_size"]))

              stats = trainer.train_epoch(epoch, batches(),
                                          log_fn=logger.info)
          writer.scalar("Loss_epoch", stats.get("loss", 0.0), epoch)

          for nt, val_set in val_sets.items():
              restore = eval_restore_fn(trainer.model, trainer.params, sf=sf)
              pairs = ((lr, hr) for hr, lr, _ in val_set)
              metrics = eval_on_pairs(restore, pairs, border=sf ** 2,
                                      ycbcr=True)
              logger.info(f"test[{nt}]: PSNR={metrics['psnr']:4.2f}, "
                          f"SSIM={metrics['ssim']:5.4f}")
              writer.scalar(f"PSNR_epoch_test_{nt}", metrics["psnr"], epoch)
              writer.scalar(f"SSIM_epoch_test_{nt}", metrics["ssim"], epoch)
              log_val_image_grids(writer, restore,
                                  ((lr, hr) for hr, lr, _ in val_set),
                                  epoch, tag=f"test_{nt}")
              # estimated-vs-GT kernel images (reference train_SISR.py:251-263)
              import jax.numpy as jnp
              from ..ops.kernels import kinfo2kernel
              hr0, lr0, kinfo_gt0 = next(iter(val_set))
              import jax
              _, kinfo_est, _ = trainer.model.apply(
                  {"params": trainer.params}, jnp.asarray(lr0[None]), sf)
              kers = np.asarray(kinfo2kernel(
                  jnp.concatenate([kinfo_est,
                                   jnp.asarray(kinfo_gt0[None])]),
                  k_size=cfg.get("k_size", 21), sf=sf))
              writer.image_grid(f"test_{nt} Kernel est|gt",
                                kers[..., None], epoch)

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
