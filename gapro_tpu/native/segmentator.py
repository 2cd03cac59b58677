"""ctypes wrapper + on-demand build for the native mesh segmentator.

Replaces `segmentator.segment_mesh`
(ISBNet/dataset/scannetv2/prepare_superpoint.py:9-16). Builds the shared
library with g++ on first use (cached next to the source).
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess

import numpy as np

_DIR = osp.dirname(osp.abspath(__file__))
_SRC = osp.join(_DIR, "segmentator.cpp")
_LIB = osp.join(_DIR, "libsegmentator.so")

_lib = None


def _build() -> str:
    if not osp.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        subprocess.check_call(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _LIB, _SRC]
        )
    return _LIB


def _load():
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(_build())
        _lib.segment_mesh.restype = ctypes.c_int32
        _lib.segment_mesh.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_float, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
    return _lib


def segment_mesh(vertices, faces, kthr: float = 0.01, seg_min: int = 20):
    """Felzenszwalb-style mesh segmentation -> per-vertex superpoint ids.

    Args:
      vertices: [N, 3] float; faces: [M, 3] int vertex indices.
      kthr: FH threshold constant; seg_min: minimum segment size.
    Returns [N] int32 compact segment labels.
    """
    lib = _load()
    v = np.ascontiguousarray(vertices, np.float32)
    f = np.ascontiguousarray(faces, np.int64)
    out = np.empty(len(v), np.int32)
    n = lib.segment_mesh(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(v),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(f),
        ctypes.c_float(kthr), ctypes.c_int32(seg_min),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if n < 0:
        raise RuntimeError("segment_mesh failed")
    return out
