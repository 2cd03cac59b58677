from .bucketing import round_up, next_bucket, pad_axis, pad_to
from .segment import (
    segment_sum,
    segment_mean,
    segment_min,
    segment_max,
    segment_prod_mask,
    compact_unique,
)

__all__ = [
    "round_up",
    "next_bucket",
    "pad_axis",
    "pad_to",
    "segment_sum",
    "segment_mean",
    "segment_min",
    "segment_max",
    "segment_prod_mask",
    "compact_unique",
]
