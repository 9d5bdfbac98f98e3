"""LPIPS perceptual metric (gated).

The reference scores SISR with LPIPS-AlexNet
(scripts/sisr_virnet_syn.py:96, 158-161).  LPIPS requires pretrained
AlexNet + calibration weights; this build environment has no network
egress and ships neither the ``lpips`` package nor cached weights, so the
metric is gated: :func:`available` reports whether it can run, and
:func:`lpips_rgb` either computes it (via the torch `lpips` package when
present) or raises with instructions.
"""

from __future__ import annotations

import numpy as np

_CALC = None


def available() -> bool:
    try:
        import lpips  # noqa: F401
        return True
    except ImportError:
        return False


def _get_calculator():
    global _CALC
    if _CALC is None:
        import lpips

        _CALC = lpips.LPIPS(net="alex")
    return _CALC


def normalize_lpips(im_uint8: np.ndarray):
    """HWC uint8 -> 1x3xHxW torch tensor in [-1, 1] (reference
    utils/util_image.py:118-126)."""
    import torch

    im = (im_uint8.astype(np.float32) - 127.5) / 127.5
    return torch.from_numpy(im.transpose(2, 0, 1)).unsqueeze(0)


def lpips_rgb(im1_uint8: np.ndarray, im2_uint8: np.ndarray) -> float:
    """LPIPS-alex between two HWC uint8 images."""
    if not available():
        raise RuntimeError(
            "LPIPS needs the 'lpips' package and pretrained AlexNet weights; "
            "install them in a network-enabled environment "
            "(pip install lpips) — this image has no egress.")
    calc = _get_calculator()
    import torch

    with torch.no_grad():
        d = calc(normalize_lpips(im1_uint8), normalize_lpips(im2_uint8))
    return float(d.item())
