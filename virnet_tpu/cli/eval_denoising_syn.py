"""Table 1/2 reproduction CLI (reference scripts/denoising_virnet_syn.py).

    python -m virnet_tpu.cli.eval_denoising_syn --noise_type niid \
        --ckpt_path model_zoo/virnet_denoising_syn.pth --save_dir ./results
"""

from __future__ import annotations

import argparse
import pickle
from pathlib import Path

import numpy as np

from ..eval.analysis import calculate_flops, calculate_parameters
from ..eval.engine import Restorer
from ..eval.tables import eval_denoise_synthetic
from ..train.logging import make_log


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_path", type=str,
                   default="model_zoo/virnet_denoising_syn.pth")
    p.add_argument("--noise_type", type=str, default="niid",
                   choices=["niid", "iid"])
    p.add_argument("--save_dir", type=str, default="")
    p.add_argument("--data_root", type=str,
                   default="/root/reference/test_data")
    p.add_argument("--pad_multiple", type=int, default=0,
                   help="0 (default) = reference-exact raw forwards; >0 "
                        "reflect-pads to size buckets (fewer recompiles "
                        "on mixed-size sets, small edge drift — see "
                        "eval/engine.py)")
    p.add_argument("--compute", type=str, default="fp32",
                   choices=["fp32", "bf16", "int8"],
                   help="fp32 (default) = checkpoint-faithful parity "
                        "eval; bf16 = deployment fast path; "
                        "int8 = quantized W8A8 serving")
    p.add_argument("--mesh", action="store_true",
                   help="shard eval batches across the device mesh "
                        "(data-parallel; per-image outputs identical)")
    args = p.parse_args(argv)

    log_path = (Path(args.save_dir) / f"denoise_{args.noise_type}.log"
                if args.save_dir else None)
    if args.save_dir:
        Path(args.save_dir).mkdir(parents=True, exist_ok=True)
    logger = make_log(log_path)

    mesh = None
    if args.mesh:
        from ..train.mesh import make_mesh

        mesh = make_mesh()
        logger.info(f"data-parallel eval over {mesh.devices.size} devices")
    restorer = Restorer("denoising-syn", ckpt_path=args.ckpt_path,
                        pad_multiple=args.pad_multiple,
                        compute=args.compute, mesh=mesh)

    # model analysis (reference logs thop params/FLOPs at 256^2 and 512^2)
    import jax.numpy as jnp
    n_params = calculate_parameters(restorer.params) / 1000 ** 2
    logger.info(f"Number of parameters: {n_params:.2f}M")
    for size in (256, 512):
        x = jnp.zeros((1, size, size, 3))
        flops = calculate_flops(
            lambda p_, x_: restorer.model.apply({"params": p_}, x_)[0],
            restorer.params, x)
        logger.info(f"FLOPs for {size}: {flops / 1000 ** 3:.2f}G")

    data_dirs = {
        "CBSD68": str(Path(args.data_root) / "CBSD68" / "*.png"),
        "McMaster": str(Path(args.data_root) / "McMaster" / "*.tif"),
    }
    results = eval_denoise_synthetic(restorer, data_dirs, args.noise_type,
                                     log_fn=logger.info)

    if args.save_dir:
        out = Path(args.save_dir) / f"results_{args.noise_type}.pkl"
        with open(out, "wb") as f:
            pickle.dump(results, f)
        logger.info(f"saved {out}")
    return results


if __name__ == "__main__":
    main()
