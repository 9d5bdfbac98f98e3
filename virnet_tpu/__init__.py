"""virnet_tpu — a TPU-native variational blind image restoration framework.

A ground-up JAX/Flax/Pallas re-design of the capabilities of zsyOAOA/VIRNet
(TPAMI 2024, arXiv:2008.10796): blind denoising (synthetic non-i.i.d./i.i.d.
Gaussian and real-world SIDD/DND) and blind single-image super-resolution
with joint variational inference over the clean image, the noise variance
map, and the blur-kernel covariance.

Layout
------
ops/      pure-jnp numerics: resampling, kernel synthesis, degradation,
          padding, dihedral augmentation, color transforms
models/   flax.linen networks (NHWC): SNet (DnCNN), KNet, RNet (AttResUNet)
          and the VIRNet / VIRNetSR wrappers
losses/   evidence-lower-bound objectives with in-graph reparameterized
          sampling (Gauss / Inverse-Gamma)
data/     host-side image sources + on-device degradation synthesis
train/    sharded training loops (jit over a data mesh), optax schedules,
          orbax checkpointing
eval/     MATLAB-faithful metrics, table harnesses, TTA, tiled inference
convert/  PyTorch .pth checkpoint importer
cli/      user-facing command line entry points
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy convenience exports (avoid importing jax at package import)."""
    if name in ("VIRNet", "VIRNetSR", "build_model", "ARCH_PRESETS"):
        from . import models
        return getattr(models, name)
    if name == "Restorer":
        from .eval.engine import Restorer
        return Restorer
    if name in ("load_torch_checkpoint", "convert_state_dict"):
        from . import convert
        return getattr(convert, name)
    raise AttributeError(name)
