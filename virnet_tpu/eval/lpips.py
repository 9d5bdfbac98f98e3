"""TPU-native LPIPS-AlexNet perceptual metric.

The reference scores SISR with LPIPS-alex (scripts/sisr_virnet_syn.py:96,
158-161) via the `lpips` torch package.  This is a from-scratch JAX
implementation of the published LPIPS v0.1 architecture (Zhang et al.,
CVPR 2018): a torchvision-AlexNet feature stack tapped after each of the
five ReLUs, channel-unit-normalized, squared-differenced, weighted by the
learned non-negative 1x1 "lin" calibration convs, spatially averaged and
summed over layers.

Weights are NOT bundled (zero-egress image, and they are third-party
artifacts); supply them as torch ``.pth``/``.pt`` files and point
``VIRNET_LPIPS_WEIGHTS`` (or the default ``model_zoo/lpips_alex.pth``) at
either
  * a full ``lpips.LPIPS(net='alex')`` state dict
    (``net.sliceK.N.weight`` + ``linK.model.1.weight`` keys), or
  * a dict ``{"alex": <torchvision alexnet state dict>, "lin": <lpips lin
    state dict>}`` for the two upstream files.

The import path and the numerics are structure-tested against a torch
replica with identical random weights (tests/test_lpips.py) — no
downloads needed to validate correctness.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_WEIGHTS = "model_zoo/lpips_alex.pth"

# lpips v0.1 ScalingLayer constants (RGB, inputs in [-1, 1])
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# torchvision AlexNet features: (out_chn, kernel, stride, pad); a 3x3/2
# max-pool precedes conv2 and conv3
_CONV_SPECS = [(64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
               (256, 3, 1, 1), (256, 3, 1, 1)]
_TV_IDX = [0, 3, 6, 8, 10]          # conv positions in alexnet.features


def _find(sd, candidates):
    for k in candidates:
        if k in sd:
            return np.asarray(sd[k])
    return None


def load_lpips_params(path_or_sd) -> Dict[str, np.ndarray]:
    """Build the JAX parameter dict from a torch checkpoint (path or an
    already-loaded state dict / {"alex","lin"} pair)."""
    if isinstance(path_or_sd, (str, os.PathLike)):
        import torch

        obj = torch.load(path_or_sd, map_location="cpu",
                         weights_only=False)
    else:
        obj = path_or_sd

    def to_np(d):
        out = {}
        for k, v in d.items():
            out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") \
                else np.asarray(v)
        return out

    if isinstance(obj, dict) and "alex" in obj and "lin" in obj:
        alex, lin = to_np(dict(obj["alex"])), to_np(dict(obj["lin"]))
        sd = {f"features.{idx}.{p}": alex[f"features.{idx}.{p}"]
              for idx in _TV_IDX for p in ("weight", "bias")}
        sd.update(lin)
    else:
        sd = to_np(dict(obj))

    params: Dict[str, np.ndarray] = {}
    for k, (idx, spec) in enumerate(zip(_TV_IDX, _CONV_SPECS)):
        w = _find(sd, [f"net.slice{k + 1}.{idx}.weight",
                       f"features.{idx}.weight"])
        b = _find(sd, [f"net.slice{k + 1}.{idx}.bias",
                       f"features.{idx}.bias"])
        if w is None or b is None:
            raise ValueError(
                f"conv{k + 1} weights not found (tried lpips and "
                f"torchvision key layouts)")
        # torch OIHW -> jax HWIO
        params[f"conv{k}_w"] = w.transpose(2, 3, 1, 0).astype(np.float32)
        params[f"conv{k}_b"] = b.astype(np.float32)
        lw = _find(sd, [f"lin{k}.model.1.weight", f"lins.{k}.model.1.weight",
                        f"lin{k}.weight"])
        if lw is None:
            raise ValueError(f"lin{k} calibration weights not found")
        params[f"lin{k}"] = lw.reshape(-1).astype(np.float32)  # (C,)

    shift = _find(sd, ["scaling_layer.shift"])
    scale = _find(sd, ["scaling_layer.scale"])
    params["shift"] = (shift.reshape(-1) if shift is not None
                       else _SHIFT).astype(np.float32)
    params["scale"] = (scale.reshape(-1) if scale is not None
                       else _SCALE).astype(np.float32)
    return params


def _conv(x, w, b, stride, pad):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    return y + b


def _maxpool3x3s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID")


def _alex_feats(params, x):
    """x: NHWC in [-1,1].  Returns the five post-ReLU feature maps."""
    h = (x - params["shift"]) / params["scale"]
    feats = []
    for k, (_, ks, stride, pad) in enumerate(_CONV_SPECS):
        if k in (1, 2):                       # pool precedes conv2, conv3
            h = _maxpool3x3s2(h)
        h = jax.nn.relu(_conv(h, params[f"conv{k}_w"],
                              params[f"conv{k}_b"], stride, pad))
        feats.append(h)
    return feats


def _unit_norm(f, eps=1e-10):
    n = jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True))
    return f / (n + eps)


@partial(jax.jit, static_argnums=())
def lpips_pair(params, x0, x1):
    """LPIPS distance between NHWC batches in [-1, 1].  Returns (N,)."""
    f0 = _alex_feats(params, x0)
    f1 = _alex_feats(params, x1)
    val = jnp.zeros(x0.shape[0], jnp.float32)
    for k in range(5):
        d = (_unit_norm(f0[k]) - _unit_norm(f1[k])) ** 2
        lin = jnp.sum(d * params[f"lin{k}"], axis=-1)   # 1x1 conv, no bias
        val = val + jnp.mean(lin, axis=(1, 2))          # spatial average
    return val


# ------------------------------------------------------------------ metric API

_PARAMS: Optional[Dict[str, np.ndarray]] = None


def _weights_path() -> Optional[str]:
    p = os.environ.get("VIRNET_LPIPS_WEIGHTS", DEFAULT_WEIGHTS)
    return p if os.path.exists(p) else None


def skip_reason() -> str:
    """Human/JSON-readable reason string recorded in eval results when
    LPIPS cannot be scored (VERDICT r3 item 8: absence must be loud)."""
    p = os.environ.get("VIRNET_LPIPS_WEIGHTS", DEFAULT_WEIGHTS)
    return (f"skipped (no weights at {p}; set VIRNET_LPIPS_WEIGHTS to a "
            "torch lpips-alex checkpoint — formats in eval/lpips.py)")


def available() -> bool:
    """True when LPIPS can be computed: a weights file is present (JAX
    path), or the torch `lpips` package is importable (fallback)."""
    if _PARAMS is not None or _weights_path():
        return True
    try:
        import lpips  # noqa: F401
        return True
    except ImportError:
        return False


def set_params(params: Dict[str, np.ndarray]) -> None:
    """Install loaded LPIPS parameters (e.g. from load_lpips_params)."""
    global _PARAMS
    _PARAMS = params


def _get_params():
    global _PARAMS
    if _PARAMS is None:
        path = _weights_path()
        if path is None:
            raise RuntimeError(
                "LPIPS weights not found: set VIRNET_LPIPS_WEIGHTS to a "
                "torch lpips-alex checkpoint (or place it at "
                f"{DEFAULT_WEIGHTS}). The metric itself is TPU-native; "
                "only the third-party weights must be supplied.")
        _PARAMS = load_lpips_params(path)
    return _PARAMS


def normalize_lpips(im_uint8: np.ndarray) -> np.ndarray:
    """HWC uint8 -> 1xHxWx3 float32 in [-1, 1] (reference
    utils/util_image.py:118-126 semantics, NHWC layout)."""
    im = (im_uint8.astype(np.float32) - 127.5) / 127.5
    return im[None]


def lpips_rgb(im1_uint8: np.ndarray, im2_uint8: np.ndarray) -> float:
    """LPIPS-alex between two HWC uint8 images (reference
    scripts/sisr_virnet_syn.py:158-161)."""
    if _PARAMS is not None or _weights_path():
        params = _get_params()
        d = lpips_pair(params, jnp.asarray(normalize_lpips(im1_uint8)),
                       jnp.asarray(normalize_lpips(im2_uint8)))
        return float(d[0])
    try:
        import lpips
        import torch
    except ImportError:
        _get_params()        # raises with instructions
        raise AssertionError("unreachable")
    calc = lpips.LPIPS(net="alex")
    t = lambda im: torch.from_numpy(  # noqa: E731
        normalize_lpips(im)[0].transpose(2, 0, 1)).unsqueeze(0)
    with torch.no_grad():
        return float(calc(t(im1_uint8), t(im2_uint8)).item())
