from .merge_bn import fold_bn, merge_bn_state_dict  # noqa: F401
from .torch_import import convert_state_dict, load_torch_checkpoint  # noqa: F401
