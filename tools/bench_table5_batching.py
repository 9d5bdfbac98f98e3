"""Measure the Table-5 harness wall-time, batched vs one-image-per-forward.

The reference's Table-5 loop runs one image per forward
(scripts/sisr_virnet_syn.py:119-156); eval/tables.py batches same-LR-shape
images through one compiled forward.  This measures the full Set14 sweep
(14 images x 7 kernels) both ways on the real chip with the bundled x4
demo checkpoint; results recorded in BASELINE.md.

    python tools/bench_table5_batching.py [--sf 4] [--data Set14]
"""

import argparse
import json
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sf", type=int, default=4)
    p.add_argument("--data", default="Set14")
    p.add_argument("--ckpt", default="model_zoo/virnet_sisr_x4_demo.pth")
    args = p.parse_args()

    from virnet_tpu.eval.engine import Restorer
    from virnet_tpu.eval.tables import eval_sisr_synthetic

    ext = "*.bmp" if args.data in ("Set14", "Set5") else "*.png"
    dirs = {args.data: f"/root/reference/test_data/{args.data}/{ext}"}
    restorer = Restorer("sisr", ckpt_path=args.ckpt, sf=args.sf)

    out = {}
    for bs in (1, 8):
        # each batch size compiles its own forward (different batch dims),
        # so both timings include one compile per LR-shape bucket — the
        # same cost profile a fresh eval process pays either way
        t0 = time.perf_counter()
        res = eval_sisr_synthetic(restorer, dirs, args.sf, use_lpips=False,
                                  batch_size=bs, log_fn=lambda *a: None)
        dt = time.perf_counter() - t0
        out[f"bs{bs}"] = dict(wall_s=round(dt, 1),
                              psnr=round(res[args.data]["psnr"], 4),
                              ssim=round(res[args.data]["ssim"], 5))
        print(f"batch_size={bs}: {dt:.1f}s  "
              f"PSNR-Y {res[args.data]['psnr']:.4f}", flush=True)
    out["speedup"] = round(out["bs1"]["wall_s"] / out["bs8"]["wall_s"], 2)
    assert abs(out["bs1"]["psnr"] - out["bs8"]["psnr"]) < 1e-6
    print(json.dumps(out))


if __name__ == "__main__":
    main()
