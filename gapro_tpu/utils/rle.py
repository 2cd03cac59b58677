"""Run-length encoding of 1D binary masks (host-side numpy).

Wire format matches the reference exporter (ISBNet/isbnet/util/rle.py:6-89):
``{"length": N, "counts": <start length start length ...>}`` with 1-based
run starts, so decoded outputs inter-operate with reference dumps.
"""

from __future__ import annotations

import numpy as np


def rle_encode(mask) -> dict:
    """1D binary mask -> {"length", "counts" (numpy int array)}."""
    mask = np.asarray(mask).astype(bool)
    n = mask.shape[0]
    padded = np.concatenate([[False], mask, [False]])
    edges = np.flatnonzero(padded[1:] != padded[:-1]) + 1
    runs = edges.copy()
    runs[1::2] -= runs[::2]
    return dict(length=int(n), counts=runs.astype(np.int64))


def rle_encode_batch(masks) -> list:
    return [rle_encode(m) for m in np.asarray(masks)]


def rle_decode(rle: dict) -> np.ndarray:
    """Inverse of :func:`rle_encode` (accepts string or array counts)."""
    counts = rle["counts"]
    if isinstance(counts, str):
        counts = np.array([int(x) for x in counts.split()], np.int64)
    counts = np.asarray(counts, np.int64)
    out = np.zeros(rle["length"], dtype=bool)
    starts = counts[::2] - 1  # 1-based
    lengths = counts[1::2]
    for s, l in zip(starts, lengths):
        out[s : s + l] = True
    return out
