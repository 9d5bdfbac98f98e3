"""Shared CLI plumbing for the three trainers."""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import as_bool, load_config, update_args
from ..eval.metrics import batch_psnr, batch_ssim
from ..eval.tiling import bucket_size


def trainer_argparser(default_config: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--save_dir", default=None, type=str,
                   help="path to save models and logs")
    p.add_argument("--config", default=default_config, type=str)
    p.add_argument("--resume", default=None, type=str,
                   help="orbax checkpoint step or reference .pth to import")
    p.add_argument("--epochs", default=None, type=int)
    p.add_argument("--steps_per_epoch", default=None, type=int)
    p.add_argument("--batch_size", default=None, type=int)
    p.add_argument("--auto_resume", action="store_true", default=None,
                   help="restart from the latest checkpoint on crash "
                        "(train/resilience.py)")
    p.add_argument("--rss_limit_mb", default=None, type=float,
                   help="re-exec with --resume latest when host RSS crosses "
                        "this bound (0/absent disables); bounds the relay-"
                        "client leak for multi-day runs — see BASELINE.md "
                        "round-5 bounded-memory audit")
    return p


def epoch_rss_watchdog(cfg: Dict, module: str, argv, logger, writer):
    """Per-epoch RSS watchdog closure for the trainer CLIs.

    Call the returned closure right after the epoch checkpoint is saved;
    it re-execs the process (resume is bitwise) once RSS crosses
    ``rss_limit_mb``.  Returns a no-op when the limit is unset.
    """
    from ..train.resilience import maybe_reexec_on_rss, reexec_argv

    limit = float(cfg.get("rss_limit_mb") or 0)
    if limit <= 0:
        return lambda: None
    cmd = reexec_argv(module, argv)
    return lambda: maybe_reexec_on_rss(limit, cmd, log_fn=logger.info,
                                       cleanup=writer.close)


def load_trainer_config(args) -> Dict:
    cfg = load_config(args.config)
    return update_args(cfg, {k: v for k, v in vars(args).items()
                             if k != "config"})


def maybe_init_multihost(cfg: Dict, log_fn=print) -> int:
    """Bring up `jax.distributed` when the config asks for it.

    The reference reads DDP process topology from the launcher env
    (train_denoising_syn.py:35-39 dist_setup); here a pod-slice run sets
    `coordinator_address` / `num_processes` / `process_id` in the config
    (or relies on the TPU metadata autodetect when all three are absent
    but `multihost: true` is set).  Single-host runs with none of these
    keys skip initialization entirely.  Returns the process count.
    """
    from ..train.mesh import init_multihost

    keys = ("coordinator_address", "num_processes", "process_id")
    if not (as_bool(cfg.get("multihost", False))
            or any(cfg.get(k) is not None for k in keys)):
        return 1
    n = init_multihost(cfg.get("coordinator_address"),
                       num_processes=cfg.get("num_processes"),
                       process_id=cfg.get("process_id"))
    log_fn(f"multi-host: {n} process(es), "
           f"{jax.device_count()} global device(s)")
    return n


_EVAL_FWD_CACHE: Dict = {}


def eval_restore_fn(model, params, sf: Optional[int] = None,
                    pad_multiple: int = 64):
    """Build a padded single-image restore closure over current params.

    The jitted forward is cached per (model, sf) so per-epoch validation
    reuses compiled executables instead of re-tracing every epoch."""
    cache_key = (model, sf)   # flax modules are hashable frozen dataclasses
    if cache_key not in _EVAL_FWD_CACHE:
        if sf is None:
            _EVAL_FWD_CACHE[cache_key] = jax.jit(
                lambda p, x: model.apply({"params": p}, x)[0])
        else:
            _EVAL_FWD_CACHE[cache_key] = jax.jit(
                lambda p, x: model.apply({"params": p}, x, sf)[0])
    fwd = _EVAL_FWD_CACHE[cache_key]
    scale = 1 if sf is None else sf

    def restore(im_hwc: np.ndarray) -> np.ndarray:
        h, w = im_hwc.shape[:2]
        hb, wb = bucket_size(h, pad_multiple), bucket_size(w, pad_multiple)
        x = jnp.asarray(im_hwc[None])
        if hb != h or wb != w:
            x = jnp.pad(x, ((0, 0), (0, hb - h), (0, wb - w), (0, 0)),
                        mode="reflect")
        out = fwd(params, x)
        return np.asarray(jnp.clip(out[0, :h * scale, :w * scale], 0, 1))

    return restore


def eval_on_pairs(restore, pairs, border: int = 0,
                  ycbcr: bool = False) -> Dict[str, float]:
    """pairs yields (noisy/lr, gt) float32 HWC; returns mean PSNR/SSIM
    with the reference's uint8 round-trip protocol."""
    psnrs, ssims = [], []
    for inp, gt in pairs:
        out = restore(inp)
        psnrs.append(batch_psnr(out[None], gt[None], border, ycbcr))
        ssims.append(batch_ssim(out[None], gt[None], border, ycbcr))
    return dict(psnr=float(np.mean(psnrs)), ssim=float(np.mean(ssims)))


def log_val_image_grids(writer, restore, pairs, epoch: int, tag: str = "test",
                        max_images: int = 4, crop: int = 256):
    """TensorBoard image grids of (restored, GT, input) for a few val images
    (the reference's vutils.make_grid summaries,
    train_denoising_syn.py:199-211)."""
    ins, outs, gts = [], [], []
    for inp, gt in pairs:
        if len(ins) >= max_images:
            break
        ins.append(np.clip(inp[:crop, :crop], 0, 1))
        outs.append(np.clip(restore(inp)[:crop, :crop], 0, 1))
        gts.append(np.clip(gt[:crop, :crop], 0, 1))
    if not outs:
        return
    h = min(x.shape[0] for x in ins + outs + gts)
    w = min(x.shape[1] for x in ins + outs + gts)
    stack = lambda xs: np.stack([x[:h, :w] for x in xs])  # noqa: E731
    writer.image_grid(f"{tag} Restored images", stack(outs), epoch)
    writer.image_grid(f"{tag} GroundTruth", stack(gts), epoch)
    writer.image_grid(f"{tag} Input", stack(ins), epoch)
