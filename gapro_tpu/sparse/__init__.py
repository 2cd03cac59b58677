from .tensor import SparseGrid
from .plan import UNetPlan, build_unet_plan
from .conv import subm_conv, subm_conv_packed, subm_conv_auto, down_conv, inverse_conv

__all__ = [
    "SparseGrid",
    "UNetPlan",
    "build_unet_plan",
    "subm_conv",
    "subm_conv_packed",
    "subm_conv_auto",
    "down_conv",
    "inverse_conv",
]
