"""Native mesh segmentator: two flat plates joined at a crease must split."""

import numpy as np
import pytest

from gapro_tpu.native.segmentator import segment_mesh


def _grid_plate(nx, ny, transform):
    """Triangulated plate: vertices [nx*ny, 3] via transform(u, v)."""
    verts = np.array([transform(i, j) for i in range(nx) for j in range(ny)],
                     np.float32)
    faces = []
    for i in range(nx - 1):
        for j in range(ny - 1):
            a = i * ny + j
            b = a + 1
            c = a + ny
            d = c + 1
            faces += [[a, b, c], [b, d, c]]
    return verts, np.array(faces, np.int64)


def test_crease_splits_plates():
    n = 12
    # horizontal plate z=0 and vertical plate x=const sharing an edge row
    v1, f1 = _grid_plate(n, n, lambda i, j: (i * 0.1, j * 0.1, 0.0))
    v2, f2 = _grid_plate(n, n, lambda i, j: ((n - 1) * 0.1, j * 0.1, i * 0.1))
    verts = np.concatenate([v1, v2])
    faces = np.concatenate([f1, f2 + len(v1)])
    labels = segment_mesh(verts, faces, kthr=0.5, seg_min=10)
    assert labels.shape == (len(verts),)
    # interior of each plate is uniform and the two differ
    lab1 = labels[: len(v1)]
    lab2 = labels[len(v1):]
    m1 = np.bincount(lab1).argmax()
    m2 = np.bincount(lab2).argmax()
    assert m1 != m2
    assert (lab1 == m1).mean() > 0.8
    assert (lab2 == m2).mean() > 0.8


def test_single_plate_single_segment():
    v, f = _grid_plate(10, 10, lambda i, j: (i * 0.1, j * 0.1, 0.0))
    labels = segment_mesh(v, f, kthr=0.5, seg_min=5)
    assert len(np.unique(labels)) == 1
