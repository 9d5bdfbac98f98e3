"""Export flax params back to a reference-format torch state dict.

Inverse of convert/torch_import.py — lets models trained in this framework
be loaded by the reference PyTorch code (and serves as a round-trip test of
the name map)."""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _conv_out(sd: Dict, torch_name: str, tree: Dict):
    sd[f"{torch_name}.weight"] = np.ascontiguousarray(
        np.asarray(tree["kernel"]).transpose(3, 2, 0, 1))
    if "bias" in tree:
        sd[f"{torch_name}.bias"] = np.asarray(tree["bias"])


def _att_layer_out(sd, prefix, tree):
    for name in ("conv1", "conv2", "mul_conv", "add_conv"):
        _conv_out(sd, f"{prefix}.{name}", tree[name])


def _att_res_block_out(sd, prefix, tree):
    _conv_out(sd, f"{prefix}.conv1", tree["conv1"])
    _conv_out(sd, f"{prefix}.conv2", tree["conv2"])
    if "sft1" in tree:
        _att_layer_out(sd, f"{prefix}.sft1", tree["sft1"])
        _att_layer_out(sd, f"{prefix}.sft2", tree["sft2"])


def export_state_dict(params: Dict[str, Any], model) -> Dict[str, np.ndarray]:
    """flax params pytree -> torch-convention state dict (numpy values)."""
    sd: Dict[str, np.ndarray] = {}

    snet = params["snet"]
    _conv_out(sd, "SNet.conv1", snet["conv1"])
    for ii in range(1, model.dep_S - 1):
        _conv_out(sd, f"SNet.mid_layer.{2 * (ii - 1)}", snet[f"mid_{ii}"])
    _conv_out(sd, "SNet.conv_last", snet["conv_last"])

    rnet = params["rnet"]
    depth = len(model.n_feat)
    _conv_out(sd, "RNet.head", rnet["head"])
    _conv_out(sd, "RNet.tail", rnet["tail"])
    for ii in range(depth):
        for jj in range(model.n_resblocks):
            _att_res_block_out(sd, f"RNet.down_path.{ii}.body.{jj}",
                               rnet[f"down_{ii}_block_{jj}"])
        if ii + 1 < depth:
            _conv_out(sd, f"RNet.down_path.{ii}.downsampler",
                      rnet[f"down_{ii}_sampler"])
    for k in range(depth - 1):
        jj = depth - 2 - k
        up = rnet[f"up_{jj}"]
        sd[f"RNet.up_path.{k}.upsampler.weight"] = np.ascontiguousarray(
            np.asarray(up["up_kernel"]).transpose(2, 3, 0, 1))
        sd[f"RNet.up_path.{k}.upsampler.bias"] = np.asarray(up["up_bias"])
        for b in range(model.n_resblocks):
            _att_res_block_out(sd, f"RNet.up_path.{k}.body.{b}",
                               up[f"block_{b}"])

    if "knet" in params:
        knet = params["knet"]
        _conv_out(sd, "KNet.head", knet["head"])
        _conv_out(sd, "KNet.tail.0", knet["tail"])
        for ii in range(model.dep_K):
            rb = knet[f"rb_{ii}"]
            bp = f"KNet.body.{ii}.body"
            _conv_out(sd, f"{bp}.0", rb["conv1"])
            _conv_out(sd, f"{bp}.2", rb["conv2"])
            _conv_out(sd, f"{bp}.3.body.0", rb["ca"]["squeeze"])
            _conv_out(sd, f"{bp}.3.body.2", rb["ca"]["excite"])
    return sd


def save_torch_checkpoint(path, params, model, epoch: int = 0) -> None:
    """Write a reference-loadable .pth (trainer wrapper format)."""
    import torch

    sd = {k: torch.from_numpy(np.asarray(v, dtype=np.float32))
          for k, v in export_state_dict(params, model).items()}
    torch.save({"epoch": epoch, "model_state_dict": sd}, str(path))
