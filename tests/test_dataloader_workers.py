"""Multiprocess prefetching dataloader (VERDICT round-1 weak #6): worker
processes must reproduce the serial loader exactly (per-index rng streams),
in the same order."""

import numpy as np

from gapro_tpu.data.dataset import SyntheticDataset, VoxelCfg, build_dataloader


def _collect(num_workers):
    ds = SyntheticDataset(n_scenes=6, training=True,
                          voxel_cfg=VoxelCfg(scale=20, max_npoint=20000,
                                             min_npoint=100))
    out = []
    for lb in build_dataloader(ds, batch_size=2, training=True, seed=3,
                               epoch=1, num_workers=num_workers):
        out.append(lb)
    return out

def test_workers_match_serial():
    serial = _collect(0)
    parallel = _collect(3)
    assert len(serial) == len(parallel) == 3
    for a, b in zip(serial, parallel):
        assert a.scan_ids == b.scan_ids
        np.testing.assert_array_equal(a.points.coords, b.points.coords)
        np.testing.assert_allclose(a.points.feats, b.points.feats)
        np.testing.assert_array_equal(a.points.instance,
                                      b.points.instance)


def test_workers_eval_mode():
    ds = SyntheticDataset(n_scenes=3, training=False,
                          voxel_cfg=VoxelCfg(scale=20, max_npoint=20000,
                                             min_npoint=100))
    got = list(build_dataloader(ds, batch_size=1, training=False,
                                drop_last=False, num_workers=2))
    assert len(got) == 3
    assert [g.scan_ids[0] for g in got] == [f"synthetic{i:04d}" for i in range(3)]
