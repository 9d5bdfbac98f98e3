"""Table 4 SIDD CLI (reference scripts/denoising_virnet_real_sidd.py).

    python -m virnet_tpu.cli.eval_sidd --sidd_dir <dir> \
        [--test] [--no_flip] --ckpt_path ... --save_dir ./results

Validation mode scores PSNR/SSIM against the GT blocks; --test mode
denoises the benchmark blocks for submission.  The x8 flip ensemble runs
as one batched forward per block chunk, and megatime (s per restored
1024^2 MP, forward time only) is reported either way.
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np

from ..eval.analysis import calculate_flops, calculate_parameters
from ..eval.engine import Restorer
from ..eval.metrics import calculate_psnr, calculate_ssim
from ..eval.tta import tta_x8
from ..ops.quant import img_as_float32, img_as_ubyte
from ..train.logging import make_log


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_path", type=str,
                   default="model_zoo/virnet_denoising_real.pth")
    p.add_argument("--sidd_dir", type=str, required=True)
    p.add_argument("--test", action="store_true",
                   help="benchmark blocks (no GT) instead of validation")
    p.add_argument("--no_flip", action="store_true",
                   help="disable the x8 flip ensemble")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--device_metrics", action="store_true",
                   help="score PSNR/SSIM on device (matches the host "
                        "protocol scorer within ~1e-3 dB; much faster)")
    p.add_argument("--compute", type=str, default="fp32",
                   choices=["fp32", "bf16", "int8"],
                   help="fp32 (default) = checkpoint-faithful parity "
                        "eval; bf16 = deployment fast path (MXU-"
                        "native passes, small dB drift)")
    p.add_argument("--mesh", action="store_true",
                   help="shard the block batch (x8 TTA included) across "
                        "the device mesh — data-parallel eval; per-image "
                        "outputs identical to single-device")
    p.add_argument("--save_dir", type=str, default="")
    args = p.parse_args(argv)

    import jax.numpy as jnp
    import scipy.io as sio

    flip = not args.no_flip
    test_str = "test" if args.test else "val"
    flip_str = "flip" if flip else "noflip"
    if args.save_dir:
        Path(args.save_dir).mkdir(parents=True, exist_ok=True)
    logger = make_log(Path(args.save_dir) / f"sidd_{test_str}_{flip_str}.log"
                      if args.save_dir else None)

    mesh = None
    if args.mesh:
        from ..train.mesh import make_mesh

        mesh = make_mesh()
        logger.info(f"data-parallel eval over {mesh.devices.size} devices")
    restorer = Restorer("denoising-real", ckpt_path=args.ckpt_path,
                        compute=args.compute, mesh=mesh)
    n_params = calculate_parameters(restorer.params) / 1000 ** 2
    logger.info(f"Number of parameters: {n_params:.2f}M")
    flops = calculate_flops(
        lambda p_, x_: restorer.model.apply({"params": p_}, x_)[0],
        restorer.params, jnp.zeros((1, 512, 512, 3)))
    logger.info(f"FLOPs for 512: {flops / 1000 ** 3:.2f}G")

    if args.test:
        mat = sio.loadmat(str(Path(args.sidd_dir)
                              / "BenchmarkNoisyBlocksSrgb.mat"))
        data_noisy = mat["BenchmarkNoisyBlocksSrgb"]
        data_gt = None
    else:
        mat = sio.loadmat(str(Path(args.sidd_dir)
                              / "ValidationNoisyBlocksSrgb.mat"))
        data_noisy = mat["ValidationNoisyBlocksSrgb"]
        data_gt = sio.loadmat(str(Path(args.sidd_dir)
                                  / "ValidationGtBlocksSrgb.mat")
                              )["ValidationGtBlocksSrgb"]

    num_im, num_blk, h, w, c = data_noisy.shape
    flat_noisy = data_noisy.reshape(-1, h, w, c)
    flat_gt = data_gt.reshape(-1, h, w, c) if data_gt is not None else None
    n_blocks = flat_noisy.shape[0]

    forward = restorer.restore_batch
    denoised = np.zeros_like(flat_noisy)
    psnr_all = ssim_all = 0.0
    total_time = 0.0
    for start in range(0, n_blocks, args.batch):
        chunk = img_as_float32(flat_noisy[start:start + args.batch])
        x = jnp.asarray(chunk)
        tic = time.perf_counter()
        out = tta_x8(forward, x) if flip else forward(x)
        out_np = np.asarray(out)      # host fetch = true sync
        total_time += time.perf_counter() - tic
        out_u8 = img_as_ubyte(np.clip(out_np, 0.0, 1.0))
        denoised[start:start + args.batch] = out_u8
        if flat_gt is not None:
            if args.device_metrics:
                from ..eval.metrics_device import (batch_psnr_device,
                                                   batch_ssim_device)
                gt_f = jnp.asarray(
                    img_as_float32(flat_gt[start:start + args.batch]))
                out_f = jnp.asarray(img_as_float32(out_u8))
                psnr_all += float(batch_psnr_device(out_f, gt_f).sum())
                ssim_all += float(batch_ssim_device(out_f, gt_f).sum())
            else:
                for i in range(out_u8.shape[0]):
                    psnr_all += calculate_psnr(flat_gt[start + i], out_u8[i])
                    ssim_all += calculate_ssim(flat_gt[start + i], out_u8[i])
        if (start // args.batch) % 10 == 0:
            logger.info(f"{start + out_u8.shape[0]}/{n_blocks} blocks")

    megatime = total_time * 1024 ** 2 / (n_blocks * h * w)
    logger.info(f"megatime: {megatime:.4f} s/MP")
    if flat_gt is not None:
        logger.info(f"PSNR={psnr_all / n_blocks:.4f}, "
                    f"SSIM={ssim_all / n_blocks:.4f}")

    if args.save_dir:
        out_path = Path(args.save_dir) / f"sidd_{test_str}_{flip_str}.mat"
        sio.savemat(str(out_path), {
            "denoised_res": denoised.reshape(num_im, num_blk, h, w, c),
            "megatime": megatime})
        logger.info(f"saved {out_path}")


if __name__ == "__main__":
    main()
