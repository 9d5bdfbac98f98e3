"""Export a trained orbax run to a reference-loadable .pth checkpoint.

    python -m virnet_tpu.cli.export_torch --task denoising-syn \
        --run_dir ./train_save --out model.pth [--sf 4]

The resulting file loads into the reference's networks/VIRNet.py classes
(strict=True) — models trained in this framework stay usable from the
original PyTorch code base.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--task", required=True,
                   choices=["denoising-syn", "denoising-real", "sisr"])
    p.add_argument("--run_dir", required=True, type=str,
                   help="trainer save_dir containing ckpts/")
    p.add_argument("--out", required=True, type=str)
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step (default: latest)")
    args = p.parse_args(argv)

    from ..convert.torch_export import save_torch_checkpoint
    from ..models import build_model
    from ..train.checkpoint import CheckpointManager

    model = build_model(args.task)
    mngr = CheckpointManager(args.run_dir)
    state = mngr.restore(args.step)
    if state is None or "params" not in state:
        raise SystemExit(f"no orbax train state under {args.run_dir}")
    epoch = int(state.get("epoch", 0))
    save_torch_checkpoint(args.out, state["params"], model, epoch=epoch)
    print(f"exported epoch-{epoch} params -> {args.out}")


if __name__ == "__main__":
    main()
