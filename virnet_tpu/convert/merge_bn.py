"""Fold BatchNorm layers into their preceding conv/linear — the
checkpoint-level equivalent of the reference's ``merge_bn`` utility
(networks/SubBlocks.py:12-42, itself from cszn/DnCNN).

The reference mutates a live torch module tree at inference time.  None of
the released VIRNet architectures contain BatchNorm, so in this package the
operation lives where it is actually useful on TPU: as a pure state-dict
transform applied ONCE at checkpoint-import time (convert/torch_import.py),
so the jitted flax graph never sees a BN op at all — the fold is free at
serving time instead of a per-process module rewrite.

Math (inference-mode BN folded into the preceding affine layer):

    y = gamma * (W*x + b - mean) / sqrt(var + eps) + beta
      = (W * s) * x + (b - mean) * s + beta,   s = gamma / sqrt(var + eps)

with ``s`` broadcast over the layer's output-channel axis (axis 0 for
Conv2d/Linear OIHW/OI weights, axis 1 for ConvTranspose2d IOHW weights —
same two cases the reference special-cases).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

__all__ = ["fold_bn", "find_conv_bn_pairs", "merge_bn_state_dict"]


def fold_bn(weight: np.ndarray, bias: np.ndarray | None,
            running_mean: np.ndarray, running_var: np.ndarray,
            gamma: np.ndarray | None = None, beta: np.ndarray | None = None,
            eps: float = 1e-5, transposed: bool = False
            ) -> Tuple[np.ndarray, np.ndarray]:
    """Fold one inference-mode BN into the preceding affine layer.

    ``weight`` is in the torch layout: OIHW (Conv2d), OI (Linear), or IOHW
    when ``transposed`` (ConvTranspose2d).  ``gamma``/``beta`` are None for
    non-affine BN.  Returns (folded_weight, folded_bias) as float64-accurate
    copies cast back to the weight dtype.
    """
    w = np.asarray(weight, dtype=np.float64)
    out_ch = w.shape[1] if transposed else w.shape[0]
    b = (np.zeros(out_ch, np.float64) if bias is None
         else np.asarray(bias, np.float64))
    mean = np.asarray(running_mean, np.float64)
    var = np.asarray(running_var, np.float64)
    s = 1.0 / np.sqrt(var + eps)
    if gamma is not None:
        s = s * np.asarray(gamma, np.float64)
    shape = [1] * w.ndim
    shape[1 if transposed else 0] = out_ch
    w_f = w * s.reshape(shape)
    b_f = (b - mean) * s
    if beta is not None:
        b_f = b_f + np.asarray(beta, np.float64)
    dt = np.asarray(weight).dtype
    return w_f.astype(dt), b_f.astype(dt)


def _module_tree(sd: Dict[str, Any]) -> Dict[str, Dict[str, Any]]:
    """Group flat state-dict keys by owning-module prefix."""
    mods: Dict[str, Dict[str, Any]] = {}
    for k, v in sd.items():
        if "." not in k:
            continue
        prefix, leaf = k.rsplit(".", 1)
        mods.setdefault(prefix, {})[leaf] = v
    return mods


def find_conv_bn_pairs(sd: Dict[str, Any]) -> List[Tuple[str, str]]:
    """Detect (affine_module, bn_module) prefix pairs in a flat torch state
    dict.

    The reference walks ``named_children()`` and pairs a BN with the
    immediately preceding Conv2d/Linear/ConvTranspose2d sibling.  At the
    state-dict level the same adjacency appears as consecutive integer
    indices inside one ``nn.Sequential`` parent (``parent.N`` conv followed
    by ``parent.N+1`` BN) — the layout every Conv+BN net in this family
    (cszn/DnCNN-style) uses.
    """
    mods = _module_tree(sd)
    pairs: List[Tuple[str, str]] = []
    for name, leaves in mods.items():
        if "running_mean" not in leaves:
            continue  # not a BN buffer set
        parent, _, idx = name.rpartition(".")
        if not idx.isdigit():
            continue
        prev = (f"{parent}.{int(idx) - 1}" if parent
                else str(int(idx) - 1))
        pw = mods.get(prev, {}).get("weight")
        if pw is not None and np.asarray(pw).ndim in (2, 4):
            pairs.append((prev, name))
    return pairs


def merge_bn_state_dict(sd: Dict[str, Any],
                        pairs: List[Tuple[str, str]] | None = None
                        ) -> Dict[str, Any]:
    """Return a new state dict with every Conv+BN pair folded into the conv
    and the BN keys removed — equivalent (to fp rounding) to running the
    reference's ``merge_bn(model)`` and re-exporting ``model.state_dict()``.

    ``pairs`` overrides auto-detection (``find_conv_bn_pairs``) for module
    trees whose adjacency is not expressed as Sequential indices.
    """
    sd = {k: np.asarray(v.detach().cpu().numpy()
                        if hasattr(v, "detach") else v)
          for k, v in sd.items()}
    if pairs is None:
        pairs = find_conv_bn_pairs(sd)
    out = dict(sd)
    for conv_name, bn_name in pairs:
        w = sd[f"{conv_name}.weight"]
        bias = sd.get(f"{conv_name}.bias")
        # ConvTranspose2d weights are IOHW: the BN channel count matches
        # dim 1, not dim 0 (square convs are ambiguous; dim 0 wins, which
        # is correct for every non-transposed layer).
        nch = len(sd[f"{bn_name}.running_mean"])
        transposed = (w.ndim == 4 and w.shape[0] != nch
                      and w.shape[1] == nch)
        w_f, b_f = fold_bn(
            w, bias,
            sd[f"{bn_name}.running_mean"], sd[f"{bn_name}.running_var"],
            sd.get(f"{bn_name}.weight"), sd.get(f"{bn_name}.bias"),
            eps=float(sd.get(f"{bn_name}.eps", 1e-5)),
            transposed=transposed)
        out[f"{conv_name}.weight"] = w_f
        out[f"{conv_name}.bias"] = b_f
        for leaf in ("weight", "bias", "running_mean", "running_var",
                     "num_batches_tracked", "eps"):
            out.pop(f"{bn_name}.{leaf}", None)
    return out
