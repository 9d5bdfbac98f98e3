"""Device-resident datasets: the patch corpus lives in HBM; batch
assembly (index sampling, random crop, dihedral augmentation) runs
inside the jitted train step.

The reference feeds training from host DataLoader workers that crop and
augment on CPU and upload every batch (datasets/DenoisingDatasets.py:
73-99 __getitem__: random_crop_patch + data_aug_np per sample).  On TPU
that puts a host→device transfer on the critical path of every step —
and on this dev host the relay client additionally leaks each transfer
buffer (BASELINE.md round-3 input-pipeline notes), so sustained runs
degrade.  The TPU-native design inverts it: upload the uint8 patch
records ONCE (a SIDD-scale 256² patch set is a few GB — fits v5e HBM),
then each step gathers B random records, crops B random windows, and
applies B random dihedral modes — all fused into the step's XLA program.
Per-step host work drops to one dispatch; input wall-fraction ~0.

Sampling semantics match the reference's distribution (uniform record,
uniform crop offset, uniform mode 0..7) without bit-matching its host
RNG — the per-(epoch, step) key derivation keeps runs reproducible and
resume-exact (tests/test_device_data.py).

Multi-chip: records are REPLICATED over the mesh and the sampled batch
is constrained to the data sharding — each device then materializes only
its batch shard (XLA partitions the gather); HBM cost is one dataset
copy per device, the right trade at VIRNet scale where the corpus is
small and ICI bandwidth is better spent on gradients.  Corpora larger
than HBM stream through ``DeviceDataset.refresh`` (chunk swap between
epochs) or fall back to the host path (data/prefetch.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------- traced dihedral

def dihedral_traced(x: jnp.ndarray, mode: jnp.ndarray) -> jnp.ndarray:
    """Dihedral mode 0..7 on HWC with a *traced* per-sample mode (the
    static-mode twin is ops/augment.dihedral; equivalence is tested).
    Requires square spatial dims.  Decomposition: rot180 (two flips) if
    mode//2 >= 2, rot90cw (transpose path) if mode//2 odd, flipud if
    mode odd — each applied via select, so the work is a few cheap
    data-movement ops regardless of mode."""
    rotk = mode // 2
    flip = mode % 2
    h, w = x.shape[-3], x.shape[-2]
    if h != w:
        raise ValueError(f"dihedral_traced needs square patches, got {h}x{w}")
    # rot180 component
    x = jnp.where(rotk >= 2, jnp.flip(x, axis=(-3, -2)), x)
    # rot90cw component (torch-tensor semantics: rot90(k=-1, axes=(H,W)))
    x = jnp.where(rotk % 2 == 1, jnp.rot90(x, k=-1, axes=(-3, -2)), x)
    # flipud component
    x = jnp.where(flip == 1, jnp.flip(x, axis=-3), x)
    return x


# ----------------------------------------------------------- batch sampling

def _crop_one(rec: jnp.ndarray, oh: jnp.ndarray, ow: jnp.ndarray,
              patch: int) -> jnp.ndarray:
    return jax.lax.dynamic_slice(
        rec, (oh, ow, 0), (patch, patch, rec.shape[-1]))


def sample_patches(key: jax.Array, records: jnp.ndarray, batch: int,
                   patch: int, augment: bool = True,
                   extra: Optional[jnp.ndarray] = None):
    """Draw a (batch, patch, patch, C) crop batch from (N, H, W, C)
    records.  ``extra``: optional second record array sampled/cropped/
    augmented with identical randomness (paired noisy/gt).  uint8 in →
    uint8 out; normalization stays in-graph downstream (the trainers'
    ``_norm``)."""
    n, h, w, _ = records.shape
    k_idx, k_oh, k_ow, k_aug = jax.random.split(key, 4)
    idx = jax.random.randint(k_idx, (batch,), 0, n)
    oh = jax.random.randint(k_oh, (batch,), 0, h - patch + 1)
    ow = jax.random.randint(k_ow, (batch,), 0, w - patch + 1)
    mode = (jax.random.randint(k_aug, (batch,), 0, 8) if augment
            else jnp.zeros((batch,), jnp.int32))

    def one(source):
        recs = jnp.take(source, idx, axis=0)
        crops = jax.vmap(_crop_one, in_axes=(0, 0, 0, None))(
            recs, oh, ow, patch)
        return jax.vmap(dihedral_traced)(crops, mode)

    out = one(records)
    if extra is None:
        return out
    return out, one(extra)


# ---------------------------------------------------- records from images

def records_from_images(paths, record_size: int, per_image: int = 8,
                        seed: int = 0) -> np.ndarray:
    """One-time host-side crop of fixed-size uint8 records from an image
    folder (the role of the reference's im2patch prep,
    datasets/prepare_data/Denoising/SIDD/im2patch_train.py:67-80: random
    fixed-size crops per source image) — the bridge from a directory of
    variable-size images to a device-resident record array.  Images
    smaller than ``record_size`` are reflect-padded up."""
    import cv2

    rng = np.random.default_rng(seed)
    out = []
    for p in sorted(str(x) for x in paths):
        im = cv2.imread(p, cv2.IMREAD_COLOR)
        if im is None:
            raise FileNotFoundError(f"unreadable image: {p}")
        im = cv2.cvtColor(im, cv2.COLOR_BGR2RGB)
        h, w = im.shape[:2]
        if h < record_size or w < record_size:
            im = np.pad(im, ((0, max(0, record_size - h)),
                             (0, max(0, record_size - w)), (0, 0)),
                        mode="reflect")
            h, w = im.shape[:2]
        for _ in range(per_image):
            oh = rng.integers(0, h - record_size + 1)
            ow = rng.integers(0, w - record_size + 1)
            out.append(im[oh:oh + record_size, ow:ow + record_size])
    if not out:
        raise ValueError("no images found")
    return np.stack(out).astype(np.uint8)


# ------------------------------------------------------------ container

class DeviceDataset:
    """Uploads uint8 record arrays once (replicated over ``mesh``) and
    hands them to the jitted step as arguments (NOT closure constants —
    constants would be baked into the executable)."""

    def __init__(self, mesh, noisy: np.ndarray,
                 gt: Optional[np.ndarray] = None):
        from ..train.mesh import replicate
        self._mesh = mesh
        if noisy.dtype != np.uint8:
            raise ValueError("device datasets store uint8 records")
        self.paired = gt is not None
        arrays = dict(noisy=np.ascontiguousarray(noisy))
        if self.paired:
            assert gt.shape == noisy.shape
            arrays["gt"] = np.ascontiguousarray(gt)
        self._dev = replicate(mesh, arrays)
        self.num_records = int(noisy.shape[0])
        self.rec_shape = tuple(noisy.shape[1:])

    @classmethod
    def from_packdb(cls, mesh, path):
        from .packdb import read_packdb_arrays
        noisy, gt = read_packdb_arrays(path)
        return cls(mesh, noisy, gt)

    @property
    def arrays(self) -> Tuple[jnp.ndarray, ...]:
        """(noisy,) or (noisy, gt) device arrays, for passing to the step."""
        if self.paired:
            return (self._dev["noisy"], self._dev["gt"])
        return (self._dev["noisy"],)

    def refresh(self, noisy: np.ndarray, gt: Optional[np.ndarray] = None):
        """Swap in a new chunk of records (same shape) — the streaming
        path for corpora larger than HBM; one upload per chunk, between
        epochs, off the step critical path."""
        from ..train.mesh import replicate
        if (noisy.shape[0] != self.num_records
                or tuple(noisy.shape[1:]) != self.rec_shape):
            raise ValueError("refresh must keep the record array shape "
                             "(avoids recompilation)")
        if self.paired != (gt is not None):
            raise ValueError("refresh must keep pairedness")
        arrays = dict(noisy=np.ascontiguousarray(noisy, dtype=np.uint8))
        if self.paired:
            arrays["gt"] = np.ascontiguousarray(gt, dtype=np.uint8)
        self._dev = replicate(self._mesh, arrays)
