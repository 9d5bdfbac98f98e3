"""One-command released-checkpoint parity harness.

Given the reference's released ``.pth`` files, runs BOTH implementations —
this framework (JAX/TPU) and the reference's own torch model classes
imported from the reference tree — over the benchmark-table eval sets and
prints per-table ΔPSNR/ΔSSIM.  The data/metric pipelines are this repo's
(bit-exact-tested against the reference's seeded protocols), so any delta
isolates model-forward differences; the ±0.01 dB north star becomes one
invocation once the released weights are supplied:

    python -m virnet_tpu.cli.parity --task denoising-syn \
        --ckpt_path model_zoo/virnet_denoising_syn.pth [--limit 4]
    python -m virnet_tpu.cli.parity --task sisr --sf 4 \
        --ckpt_path model_zoo/virnet_sisr_x4.pth
    python -m virnet_tpu.cli.parity --task all          # default zoo paths

Reference protocols mirrored: scripts/testing_demo.py:21-75 (model
construction per task), scripts/denoising_virnet_syn.py:92-142 (Table 1/2),
scripts/sisr_virnet_syn.py:88-156 (Table 5), plus SIDD Table 4 when
--sidd_dir points at the validation .mat pair.
"""

from __future__ import annotations

import argparse
import sys
import types
from pathlib import Path

import numpy as np

REF_DIR = Path("/root/reference")


# --------------------------------------------------------------- torch side

def _import_reference_networks(ref_dir: Path):
    if "thop" not in sys.modules:
        thop = types.ModuleType("thop")
        thop.profile = None
        sys.modules["thop"] = thop
    sys.path.insert(0, str(ref_dir))
    try:
        from networks.VIRNet import VIRAttResUNet, VIRAttResUNetSR
    finally:
        sys.path.remove(str(ref_dir))
    return VIRAttResUNet, VIRAttResUNetSR


def build_reference_model(task: str, ckpt_path: str, sf: int = 2,
                          ref_dir: Path = REF_DIR):
    """Reference model with released weights (scripts/testing_demo.py:21-75,
    incl. the 'module.' prefix strip at :69-72)."""
    import torch

    VIRAttResUNet, VIRAttResUNetSR = _import_reference_networks(ref_dir)
    if task == "denoising-syn":
        net = VIRAttResUNet(im_chn=3, sigma_chn=1, n_feat=[96, 192, 288],
                            dep_S=5, n_resblocks=3, noise_cond=True,
                            extra_mode="Input", noise_avg=False)
    elif task == "denoising-real":
        net = VIRAttResUNet(im_chn=3, sigma_chn=3,
                            n_feat=[96, 160, 224, 288], dep_S=8,
                            n_resblocks=3, noise_cond=True,
                            extra_mode="Input", noise_avg=False)
    elif task == "sisr":
        net = VIRAttResUNetSR(im_chn=3, sigma_chn=1, kernel_chn=3,
                              n_feat=[96, 160, 224], dep_S=5, dep_K=8,
                              n_resblocks=2, noise_cond=True,
                              kernel_cond=True, extra_mode="Both",
                              noise_avg=True)
    else:
        raise ValueError(task)

    state = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "model_state_dict" in state:
        state = state["model_state_dict"]
    state = {(k[7:] if k.startswith("module.") else k): v
             for k, v in state.items()}
    net.load_state_dict(state, strict=True)
    net.eval()
    return net


class TorchRestorer:
    """Reference model behind this repo's Restorer interface, so the same
    table harnesses drive both implementations."""

    def __init__(self, task: str, ckpt_path: str, sf: int = 2,
                 ref_dir: Path = REF_DIR):
        self.task = task
        self.sf = sf if task == "sisr" else 1
        # pad_multiple=1: the reference model reflect-pads internally
        # (networks/AttResUNet.py:148-150)
        self.pad_multiple = 1
        self.gray_mean = False
        self.net = build_reference_model(task, ckpt_path, sf, ref_dir)

    def _forward_np(self, x: np.ndarray) -> np.ndarray:
        import torch

        t = torch.from_numpy(
            np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
        with torch.no_grad():
            if self.task == "sisr":
                mu = self.net(t, self.sf)[0]
            else:
                mu = self.net(t)[0]
        return mu.clamp(0.0, 1.0).numpy().transpose(0, 2, 3, 1)

    def restore_batch(self, x) -> np.ndarray:
        return self._forward_np(np.asarray(x, dtype=np.float32))

    def restore_image(self, im: np.ndarray) -> np.ndarray:
        if im.ndim == 2:
            im = np.stack([im] * 3, axis=2)
        return self._forward_np(im[None].astype(np.float32))[0]


# ------------------------------------------------------------------- driving

def _limit_dir(src_glob: str, limit: int, tmp_root: Path,
               name: str) -> str:
    """Optionally restrict an eval set to its first `limit` images."""
    if not limit:
        return src_glob
    pattern = Path(src_glob).name if "*" in src_glob else "*.png"
    root = Path(src_glob).parent if "*" in src_glob else Path(src_glob)
    sub = tmp_root / name
    sub.mkdir(parents=True, exist_ok=True)
    import shutil

    files = sorted(root.glob(pattern))[:limit]
    for f in files:
        shutil.copy(f, sub / f.name)
    return str(sub / pattern.replace("*", "*"))


def _delta_table(name: str, ours: dict, theirs: dict, rows) -> int:
    """Print per-case ΔPSNR/ΔSSIM; returns the number of rows outside the
    ±0.01 dB goal."""
    bad = 0
    print(f"\n== {name} ==")
    print(f"{'case':>24s} {'PSNR(jax)':>10s} {'PSNR(ref)':>10s} "
          f"{'ΔdB':>8s} {'ΔSSIM':>9s}")
    for label, a, b in rows(ours, theirs):
        dpsnr = a["psnr"] - b["psnr"]
        dssim = a["ssim"] - b["ssim"]
        flag = "" if abs(dpsnr) <= 0.01 else "  <-- >0.01 dB"
        if abs(dpsnr) > 0.01:
            bad += 1
        print(f"{label:>24s} {a['psnr']:10.3f} {b['psnr']:10.3f} "
              f"{dpsnr:+8.4f} {dssim:+9.5f}{flag}")
    return bad


def run_denoise_parity(task: str, ckpt: str, data_root: Path, limit: int,
                       tmp_root: Path, noise_types=("niid", "iid")) -> int:
    from ..eval.engine import Restorer
    from ..eval.tables import eval_denoise_synthetic

    data_dirs = {"CBSD68": str(data_root / "CBSD68" / "*.png")}
    mcm = data_root / "McMaster"
    if mcm.is_dir():
        data_dirs["McMaster"] = str(mcm / "*.tif")
        if not list(mcm.glob("*.tif")):
            data_dirs["McMaster"] = str(mcm / "*.png")
    data_dirs = {k: _limit_dir(v, limit, tmp_root, f"{task}_{k}")
                 for k, v in data_dirs.items()}

    ours = Restorer(task, ckpt_path=ckpt)
    ref = TorchRestorer(task, ckpt)
    bad = 0
    for nt in noise_types:
        a = eval_denoise_synthetic(ours, data_dirs, nt,
                                   log_fn=lambda *a_: None)
        b = eval_denoise_synthetic(ref, data_dirs, nt,
                                   log_fn=lambda *a_: None)

        def rows(a_, b_):
            for ds in a_:
                for case in a_[ds]:
                    yield f"{ds}/{case}", a_[ds][case], b_[ds][case]
        bad += _delta_table(f"{task} / {nt} (Tables 1-2 protocol)",
                            a, b, rows)
    return bad


def run_sisr_parity(ckpt: str, sf: int, data_root: Path, limit: int,
                    tmp_root: Path, nlevel: float = 2.55) -> int:
    from ..eval.engine import Restorer
    from ..eval.tables import eval_sisr_synthetic

    data_dirs = {"Set14": str(data_root / "Set14" / "*.bmp"),
                 "CBSD68": str(data_root / "CBSD68" / "*.png")}
    data_dirs = {k: _limit_dir(v, limit, tmp_root, f"sisr_{k}")
                 for k, v in data_dirs.items()}

    ours = Restorer("sisr", ckpt_path=ckpt, sf=sf)
    ref = TorchRestorer("sisr", ckpt, sf=sf)
    a = eval_sisr_synthetic(ours, data_dirs, sf, nlevel=nlevel,
                            use_lpips=False, log_fn=lambda *a_: None)
    b = eval_sisr_synthetic(ref, data_dirs, sf, nlevel=nlevel,
                            use_lpips=False, log_fn=lambda *a_: None)

    def rows(a_, b_):
        for ds in a_:
            for i, (ka, kb) in enumerate(zip(a_[ds]["per_kernel"],
                                             b_[ds]["per_kernel"])):
                yield f"{ds}/kernel{i + 1}", ka, kb
            yield f"{ds}/mean", a_[ds], b_[ds]
    return _delta_table(f"sisr x{sf} nlevel={nlevel} (Table 5 protocol)",
                        a, b, rows)


def run_sidd_parity(ckpt: str, sidd_dir: Path) -> int:
    from ..eval.engine import Restorer
    from ..eval.tables import eval_sidd

    noisy = sidd_dir / "ValidationNoisyBlocksSrgb.mat"
    gt = sidd_dir / "ValidationGtBlocksSrgb.mat"
    if not noisy.exists():
        print(f"(SIDD parity skipped: {noisy} not found)")
        return 0
    ours = Restorer("denoising-real", ckpt_path=ckpt)
    ref = TorchRestorer("denoising-real", ckpt)
    a = eval_sidd(ours, str(noisy), str(gt), log_fn=lambda *a_: None)
    b = eval_sidd(ref, str(noisy), str(gt), log_fn=lambda *a_: None)
    return _delta_table(
        "denoising-real / SIDD (Table 4 protocol)", a, b,
        lambda a_, b_: [("SIDD-val", a_, b_)])


def main(argv=None):
    p = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--task", default="all",
                   choices=["all", "denoising-syn", "denoising-real",
                            "sisr"])
    p.add_argument("--ckpt_path", type=str, default="",
                   help="released .pth (default: model_zoo/<task>.pth)")
    p.add_argument("--sf", type=int, default=4, choices=[2, 3, 4])
    p.add_argument("--data_root", type=str,
                   default=str(REF_DIR / "test_data"))
    p.add_argument("--sidd_dir", type=str, default="",
                   help="dir holding the SIDD validation .mat pair")
    p.add_argument("--limit", type=int, default=0,
                   help="use only the first N images per set (0 = all)")
    p.add_argument("--noise_types", type=str, default="niid,iid",
                   help="comma list for the denoise tables")
    p.add_argument("--tmp_dir", type=str, default="/tmp/virnet_parity")
    args = p.parse_args(argv)

    data_root = Path(args.data_root)
    tmp_root = Path(args.tmp_dir)
    zoo = {
        "denoising-syn": "model_zoo/virnet_denoising_syn.pth",
        "denoising-real": "model_zoo/virnet_denoising_real.pth",
        "sisr": f"model_zoo/virnet_sisr_x{args.sf}.pth",
    }
    tasks = ([args.task] if args.task != "all" else list(zoo))

    total_bad = 0
    ran = 0
    for task in tasks:
        ckpt = args.ckpt_path if args.task != "all" and args.ckpt_path \
            else zoo[task]
        if not Path(ckpt).exists():
            print(f"({task} skipped: checkpoint {ckpt} not found)")
            continue
        ran += 1
        nts = tuple(args.noise_types.split(","))
        if task == "denoising-syn":
            total_bad += run_denoise_parity(task, ckpt, data_root,
                                            args.limit, tmp_root, nts)
        elif task == "denoising-real":
            total_bad += run_denoise_parity(task, ckpt, data_root,
                                            args.limit, tmp_root, nts)
            if args.sidd_dir:
                total_bad += run_sidd_parity(ckpt, Path(args.sidd_dir))
        else:
            total_bad += run_sisr_parity(ckpt, args.sf, data_root,
                                         args.limit, tmp_root)

    if ran == 0:
        print("no checkpoints found — nothing compared")
        return 2
    print(f"\n{'PASS' if total_bad == 0 else 'FAIL'}: "
          f"{total_bad} case(s) outside the ±0.01 dB goal")
    return 0 if total_bad == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
