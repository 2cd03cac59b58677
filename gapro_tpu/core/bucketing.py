"""Static-shape bucketing utilities.

XLA traces and compiles once per distinct input shape.  Point clouds have
wildly varying sizes, so every device-side array is padded up to a *bucket*
— by default the next power of two (with a small multiplier grid for finer
granularity) — so that a handful of compiled programs cover the whole
dataset.  Validity is tracked with explicit counts/masks, never with dynamic
shapes.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np


def round_up(x: int, m: int) -> int:
    """Round ``x`` up to a multiple of ``m``."""
    return ((x + m - 1) // m) * m


def next_bucket(n: int, min_size: int = 128, granularity: int = 2) -> int:
    """Smallest bucket >= n.

    Buckets are ``{1, 1.5} * 2^k`` when ``granularity == 2`` (so at most 50%
    padding overhead), or pure powers of two when ``granularity == 1``.
    """
    n = max(int(n), 1)
    if n <= min_size:
        return min_size
    p = 1 << (n - 1).bit_length()  # next pow2 >= n
    if granularity >= 2:
        candidate = (p // 4) * 3  # 0.75 * p == 1.5 * (p/2)
        if candidate >= n and candidate >= min_size:
            return candidate
    return p


def pad_axis(x: np.ndarray, size: int, axis: int = 0, fill=0) -> np.ndarray:
    """Pad numpy array ``x`` along ``axis`` to ``size`` with ``fill``."""
    cur = x.shape[axis]
    if cur == size:
        return x
    if cur > size:
        raise ValueError(f"cannot pad axis {axis} of length {cur} down to {size}")
    pad_width = [(0, 0)] * x.ndim
    pad_width[axis] = (0, size - cur)
    return np.pad(x, pad_width, mode="constant", constant_values=fill)


def pad_to(x: np.ndarray, sizes: Sequence[int | None], fill=0) -> np.ndarray:
    """Pad multiple axes at once; ``None`` leaves an axis untouched."""
    out = x
    for ax, s in enumerate(sizes):
        if s is not None:
            out = pad_axis(out, s, axis=ax, fill=fill)
    return out


def bucketed_batch_size(sizes: Sequence[int], min_size: int = 128) -> int:
    """Bucket for the total of ``sizes`` (used when concatenating scenes)."""
    return next_bucket(int(sum(sizes)), min_size=min_size)


def log2_bucket_id(n: int) -> int:
    """Stable integer id for a bucket size (for compile-cache bookkeeping)."""
    return int(math.log2(next_bucket(n)))
