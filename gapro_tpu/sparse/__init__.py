from .tensor import SparseGrid
from .plan import UNetPlan, build_unet_plan
from .conv import subm_conv, down_conv, inverse_conv

__all__ = [
    "SparseGrid",
    "UNetPlan",
    "build_unet_plan",
    "subm_conv",
    "down_conv",
    "inverse_conv",
]
