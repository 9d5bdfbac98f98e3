"""PyTorch checkpoint importer.

Maps the reference's released ``.pth`` state dicts (networks/VIRNet.py
module tree) onto this package's flax parameter pytree, transposing conv
weights OIHW -> HWIO and transposed-conv weights IOHW -> HWIO-blocks.

Torch-side key layout being mapped (reference file:line):
  SNet.conv1 / SNet.mid_layer.{2i} / SNet.conv_last       networks/DnCNN.py:22-29
  RNet.head, RNet.down_path.{i}.body.{j}.(sft1|sft2).*    networks/AttResUNet.py:11-139
  RNet.down_path.{i}.downsampler, RNet.up_path.{k}.*      networks/AttResUNet.py:62-90
  KNet.head / KNet.body.{i}.body.* / KNet.tail.0          networks/KNet.py:41-59
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _conv(sd: Dict[str, np.ndarray], torch_name: str, bias: bool = True):
    """torch conv -> {'kernel': HWIO, 'bias': (O,)}"""
    w = sd[f"{torch_name}.weight"]
    out = {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}
    if bias:
        out["bias"] = sd[f"{torch_name}.bias"]
    return out


def _att_layer(sd, prefix: str):
    return {
        "conv1": _conv(sd, f"{prefix}.conv1"),
        "conv2": _conv(sd, f"{prefix}.conv2"),
        "mul_conv": _conv(sd, f"{prefix}.mul_conv"),
        "add_conv": _conv(sd, f"{prefix}.add_conv"),
    }


def _att_res_block(sd, prefix: str, conditioned: bool):
    out = {
        "conv1": _conv(sd, f"{prefix}.conv1"),
        "conv2": _conv(sd, f"{prefix}.conv2"),
    }
    if conditioned:
        out["sft1"] = _att_layer(sd, f"{prefix}.sft1")
        out["sft2"] = _att_layer(sd, f"{prefix}.sft2")
    return out


def _dncnn(sd, prefix: str, dep: int):
    out = {"conv1": _conv(sd, f"{prefix}.conv1")}
    for ii in range(1, dep - 1):
        out[f"mid_{ii}"] = _conv(sd, f"{prefix}.mid_layer.{2 * (ii - 1)}")
    out["conv_last"] = _conv(sd, f"{prefix}.conv_last")
    return out


def _attresunet(sd, prefix: str, depth: int, n_resblocks: int,
                cond_down: bool):
    out = {"head": _conv(sd, f"{prefix}.head"),
           "tail": _conv(sd, f"{prefix}.tail")}
    for ii in range(depth):
        for jj in range(n_resblocks):
            out[f"down_{ii}_block_{jj}"] = _att_res_block(
                sd, f"{prefix}.down_path.{ii}.body.{jj}", cond_down)
        if ii + 1 < depth:
            out[f"down_{ii}_sampler"] = _conv(
                sd, f"{prefix}.down_path.{ii}.downsampler")
    # torch up_path[k] corresponds to our up_{depth-2-k}
    for k in range(depth - 1):
        jj = depth - 2 - k
        up_prefix = f"{prefix}.up_path.{k}"
        w = sd[f"{up_prefix}.upsampler.weight"]       # (I, O, 2, 2)
        up = {
            "up_kernel": np.ascontiguousarray(w.transpose(2, 3, 0, 1)),
            "up_bias": sd[f"{up_prefix}.upsampler.bias"],
        }
        for b in range(n_resblocks):
            up[f"block_{b}"] = _att_res_block(
                sd, f"{up_prefix}.body.{b}", conditioned=False)
        out[f"up_{jj}"] = up
    return out


def _knet(sd, prefix: str, num_blocks: int):
    out = {"head": _conv(sd, f"{prefix}.head", bias=False),
           "tail": _conv(sd, f"{prefix}.tail.0")}
    for ii in range(num_blocks):
        bp = f"{prefix}.body.{ii}.body"
        out[f"rb_{ii}"] = {
            "conv1": _conv(sd, f"{bp}.0"),
            "conv2": _conv(sd, f"{bp}.2"),
            "ca": {
                "squeeze": _conv(sd, f"{bp}.3.body.0"),
                "excite": _conv(sd, f"{bp}.3.body.2"),
            },
        }
    return out


def convert_state_dict(state_dict: Dict[str, Any], model) -> Dict[str, Any]:
    """Convert a torch state dict into the flax params pytree for ``model``
    (a VIRNet or VIRNetSR instance from virnet_tpu.models)."""
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module."):]
        sd[k] = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                           else v, dtype=np.float32)

    depth = len(model.n_feat)
    cond_down = model.extra_mode.lower() in ("down", "both")

    params = {
        "snet": _dncnn(sd, "SNet", model.dep_S),
        "rnet": _attresunet(sd, "RNet", depth, model.n_resblocks, cond_down),
    }
    if hasattr(model, "dep_K"):
        params["knet"] = _knet(sd, "KNet", model.dep_K)
    return {"params": params}


def load_torch_checkpoint(path, model) -> Dict[str, Any]:
    """Load a reference ``.pth`` file (either a bare state dict or the
    trainer's {'model_state_dict': ...} wrapper) into flax params."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
        ckpt = ckpt["model_state_dict"]
    return convert_state_dict(ckpt, model)
