from .attresunet import AttLayer, AttResBlock, AttResUNet, UpBlock  # noqa: F401
from .dncnn import DnCNN  # noqa: F401
from .knet import CALayer, KernelNet, RBLayer  # noqa: F401
from .virnet import ARCH_PRESETS, VIRNet, VIRNetSR, build_model  # noqa: F401
