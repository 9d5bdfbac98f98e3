"""User-facing demo CLI, argument-compatible with the reference's
scripts/testing_demo.py:99-135:

    python -m virnet_tpu.cli.demo --task {denoising-syn,denoising-real,sisr}
        --in_path <file-or-dir> --out_path <dir> [--sf {2,3,4}]
        [--ckpt_path <pth-or-orbax>] [--prefix restored_] [--flip]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff")


def collect_images(in_path: Path):
    if in_path.is_dir():
        return sorted(p for p in in_path.iterdir()
                      if p.suffix.lower() in IMG_EXTS)
    return [in_path]


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--task", required=True,
                        choices=["denoising-syn", "denoising-real", "sisr"])
    parser.add_argument("--in_path", required=True, type=str)
    parser.add_argument("--out_path", type=str, default="./results")
    parser.add_argument("--sf", type=int, default=2, choices=[2, 3, 4])
    parser.add_argument("--ckpt_path", type=str, default=None,
                        help="reference .pth checkpoint to import")
    parser.add_argument("--prefix", type=str, default="restored_")
    parser.add_argument("--flip", action="store_true",
                        help="x8 flip/rotation self-ensemble")
    parser.add_argument("--rows_shard", action="store_true",
                        help="shard each image's rows across the whole "
                             "device mesh (huge images; matches the "
                             "plain forward)")
    parser.add_argument("--compute", type=str, default="fp32",
                        choices=["fp32", "bf16", "int8"],
                        help="fp32 (default) = checkpoint-faithful; "
                             "bf16 = deployment fast path; int8 = "
                             "quantized W8A8 serving (ops/qconv.py)")
    parser.add_argument("--mesh", action="store_true",
                        help="data-parallel inference over all devices: "
                             "folder batches and the x8 --flip ensemble "
                             "shard across the mesh (outputs identical "
                             "to single-device)")
    parser.add_argument("--batch_size", type=int, default=8,
                        help="images per forward in folder mode (same-"
                             "shape images are grouped)")
    args = parser.parse_args(argv)

    from ..eval.engine import Restorer
    from ..ops.color import imread, imwrite
    from ..ops.quant import img_as_ubyte

    ckpt = args.ckpt_path
    if ckpt is None:
        default_names = {
            "denoising-syn": "virnet_denoising_syn.pth",
            "denoising-real": "virnet_denoising_real.pth",
            "sisr": f"virnet_sisr_x{args.sf}.pth",
        }
        ckpt = str(Path("model_zoo") / default_names[args.task])

    if args.rows_shard and args.flip:
        raise SystemExit("--rows_shard and --flip are mutually exclusive "
                         "(run the x8 ensemble unsharded, or shard without "
                         "the ensemble)")
    if args.rows_shard and args.mesh:
        raise SystemExit("--rows_shard already uses the whole mesh "
                         "(spatial axis); --mesh is the data-parallel "
                         "alternative")

    if not Path(ckpt).exists():
        raise SystemExit(
            f"checkpoint not found: {ckpt}\n"
            "pass --ckpt_path pointing at a reference .pth or a trainer "
            "save_dir (orbax)")
    mesh = None
    if args.mesh:
        from ..train.mesh import make_mesh

        mesh = make_mesh()
    restorer = Restorer(args.task, ckpt_path=ckpt, sf=args.sf,
                        compute=args.compute, mesh=mesh)

    out_dir = Path(args.out_path)
    out_dir.mkdir(parents=True, exist_ok=True)
    im_paths = collect_images(Path(args.in_path))

    def write(im_path, restored):
        out = img_as_ubyte(np.clip(restored, 0.0, 1.0))
        out_file = out_dir / f"{args.prefix}{im_path.stem}.png"
        imwrite(out, out_file, chn="rgb")
        print(f"{im_path.name} -> {out_file}")

    if args.mesh and not (args.flip or args.rows_shard):
        # folder mode: same-shape images batched and sharded over the mesh
        ims = [imread(p, chn="rgb", dtype="float32") for p in im_paths]
        for im_path, restored in zip(
                im_paths, restorer.restore_images(ims, args.batch_size)):
            write(im_path, restored)
        return
    for im_path in im_paths:
        im = imread(im_path, chn="rgb", dtype="float32")
        if args.rows_shard:
            restored = restorer.restore_image_sharded(im)
        elif args.flip:
            restored = restorer.restore_image_tta(im)
        else:
            restored = restorer.restore_image(im)
        write(im_path, restored)


if __name__ == "__main__":
    main()
