"""Datasets + loader (host-side).

Mirrors the reference data layer (ISBNet/isbnet/data/):
  * ScanNetDataset — `<prefix>/<scan>_inst_nostuff.pth` scenes, superpoints,
    pseudo labels from a `label_type` directory (scannetv2.py:33-53), repeat
    factor for training (custom.py init).
  * S3DISDataset — pth scenes with 25% random train subsample and 4-piece
    interleaved test split (s3dis.py:50-116).
  * SyntheticDataset — fabricated rooms (no dataset ships with this machine).

The loader is a plain python iterator (TPU input is host-side anyway): it
shuffles, applies transform_train / transform_test, collates with
:func:`gapro_tpu.models.prepare.points_to_batch_np` into power-of-2 point
buckets (so jit recompiles stay bounded), and yields PointBatch + metadata.
"""

from __future__ import annotations

import os.path as osp
from dataclasses import dataclass
from glob import glob
from typing import Iterator, List, Optional, Tuple

import numpy as np

from ..core.bucketing import next_bucket
from ..models.prepare import PointBatch, points_to_batch_np
from .augment import transform_test, transform_train
from .scannet_io import (
    load_pseudo_labels,
    load_scene,
    load_superpoints,
    remap_semantic_for_training,
)
from .synthetic import make_synthetic_scene


@dataclass
class VoxelCfg:
    scale: float = 50.0
    spatial_shape: Tuple[int, int] = (128, 512)
    max_npoint: int = 250_000
    min_npoint: int = 5_000


class ScanNetDataset:
    """ScanNetv2 scenes with optional GP pseudo labels (label_type dir)."""

    def __init__(self, data_root, prefix="train", suffix="_inst_nostuff.pth",
                 label_type=None, training=True, repeat=1,
                 voxel_cfg: VoxelCfg = VoxelCfg()):
        self.data_root = data_root
        self.prefix = prefix
        self.training = training
        self.repeat = repeat
        self.voxel_cfg = voxel_cfg
        self.label_type = label_type
        self.files = sorted(glob(osp.join(data_root, prefix, "*" + suffix)))

    def __len__(self):
        return len(self.files) * (self.repeat if self.training else 1)

    def remap_semantic(self, sem):
        """ScanNet raw ids -> training ids (GaPro -2 remap). S3DIS
        overrides: its 13 classes are already training ids (reference
        s3dis.py keeps semantic_label unshifted; every class incl.
        ceiling/floor is an instance class)."""
        return remap_semantic_for_training(sem)

    def scan_id(self, index):
        f = self.files[index % len(self.files)]
        return osp.basename(f).replace("_inst_nostuff.pth", "")

    def load(self, index) -> dict:
        f = self.files[index % len(self.files)]
        scan = self.scan_id(index)
        xyz, rgb, sem, inst = load_scene(f)
        spp = load_superpoints(osp.join(self.data_root, "superpoints", scan + ".pth"))
        n = len(xyz)
        prob = np.ones(n, np.float32)
        mu = np.full(n, -100.0, np.float32)
        var = np.full(n, -100.0, np.float32)
        if self.training and self.label_type:
            # pseudo labels replace GT (scannetv2.py:33-53)
            ps = osp.join(self.data_root, self.label_type, scan + ".pth")
            sem, inst, prob, mu_spp, var_spp = load_pseudo_labels(ps)
            # saved mu/var are per-superpoint; expand via the scene's spp ids
            _, spp_c = np.unique(spp, return_inverse=True)
            mu = mu_spp[spp_c].astype(np.float32)
            var = var_spp[spp_c].astype(np.float32)
        else:
            sem = self.remap_semantic(sem)
        return dict(xyz=xyz, rgb=rgb, semantic=sem.astype(np.int64),
                    instance=inst.astype(np.int64), spp=spp,
                    prob=prob, mu=mu, var=var, scan_id=scan)


class S3DISDataset(ScanNetDataset):
    """S3DIS areas (s3dis.py): 25%-subsampled train scenes, 4-piece
    interleaved split at test time for huge rooms."""

    def __init__(self, *args, x4_split=True, subsample_train=0.25, **kw):
        super().__init__(*args, **kw)
        self.x4_split = x4_split
        self.subsample_train = subsample_train
        if not self.files:
            # reference semantics (s3dis.py:30-40): prefix is a FILENAME
            # prefix inside preprocess/ (e.g. "Area_5"; comma-separated for
            # the reference's prefix LIST), not a directory
            self.files = sorted(
                f for p in str(self.prefix).split(",")
                for f in glob(osp.join(self.data_root, "preprocess",
                                       p.strip() + "*_inst_nostuff.pth")))

    def remap_semantic(self, sem):
        return np.asarray(sem).astype(np.int64)  # s3dis ids ARE training ids

    def load(self, index):
        scene = super().load(index)
        if self.training and self.subsample_train < 1.0:
            rng = np.random.default_rng(index)
            n = len(scene["xyz"])
            keep = rng.random(n) < self.subsample_train
            for k in ("xyz", "rgb", "semantic", "instance", "spp", "prob", "mu", "var"):
                scene[k] = scene[k][keep]
        return scene

    def split_pieces(self, scene, n_pieces=4):
        """Interleaved split by sorted x-coordinate (s3dis.py:79-116)."""
        order = np.argsort(scene["xyz"][:, 0], kind="stable")
        pieces = []
        for p in range(n_pieces):
            idx = order[p::n_pieces]
            piece = {k: (v[idx] if isinstance(v, np.ndarray) and len(v) == len(order) else v)
                     for k, v in scene.items()}
            piece["piece_indices"] = idx
            pieces.append(piece)
        return pieces


class SyntheticDataset:
    """Fabricated ScanNet-like rooms for tests/benches on this machine."""

    def __init__(self, n_scenes=8, training=True, voxel_cfg: VoxelCfg = VoxelCfg(),
                 repeat=1, **scene_kw):
        self.n = n_scenes
        self.training = training
        self.repeat = repeat
        self.voxel_cfg = voxel_cfg
        self.scene_kw = scene_kw

    def __len__(self):
        return self.n * (self.repeat if self.training else 1)

    def scan_id(self, index):
        return f"synthetic{index % self.n:04d}"

    def load(self, index) -> dict:
        s = make_synthetic_scene(seed=index % self.n, **self.scene_kw)
        n = len(s.xyz)
        return dict(
            xyz=s.xyz, rgb=s.rgb,
            semantic=remap_semantic_for_training(s.semantic_label),
            instance=s.instance_label.astype(np.int64), spp=s.spp,
            prob=np.ones(n, np.float32),
            mu=np.full(n, -100.0, np.float32),
            var=np.full(n, -100.0, np.float32),
            scan_id=self.scan_id(index),
        )


@dataclass
class LoaderBatch:
    points: PointBatch
    scan_ids: List[str]
    scenes: List[dict]  # post-transform per-scene dicts (for eval plumbing)
    batch_size: int


def _prep_scene(dataset, training, vc, seed, epoch, i):
    """Load + augment one scene. Per-index rng stream so results are
    deterministic regardless of worker count / completion order."""
    scene = dataset.load(int(i))
    rng = np.random.default_rng((seed + epoch) * 1_000_003 + int(i))
    if training:
        return transform_train(
            scene, vc.scale, vc.spatial_shape[1], vc.max_npoint, rng,
            min_npoint=vc.min_npoint,
        )
    return transform_test(scene, vc.scale)


# fork-inherited worker state (multiprocess path)
_WORKER_CTX: dict = {}


def _worker_init(dataset, training, vc, seed, epoch):
    _WORKER_CTX.update(dataset=dataset, training=training, vc=vc,
                       seed=seed, epoch=epoch)


def _worker_prep(i):
    c = _WORKER_CTX
    return _prep_scene(c["dataset"], c["training"], c["vc"], c["seed"],
                       c["epoch"], i)


def build_dataloader(dataset, batch_size=4, training=True, seed=0,
                     drop_last=True, epoch=0, num_workers=0,
                     prefetch_batches=2) -> Iterator[LoaderBatch]:
    """Shuffling batching iterator -> LoaderBatch with bucketed PointBatch.

    ``num_workers > 0`` runs load+augmentation in forked worker processes
    (the reference's multiprocess DataLoader, ISBNet/isbnet/data/
    __init__.py:26-51) with a ``prefetch_batches``-deep in-order pipeline so
    host augmentation overlaps the device step; scene order and augmentation
    draws are identical to the serial path (per-index rng streams).
    """
    rng = np.random.default_rng(seed + epoch)
    order = np.arange(len(dataset))
    if training:
        rng.shuffle(order)
    vc = dataset.voxel_cfg

    def emit(results):
        batch_scenes: List[dict] = []
        ids: List[str] = []
        for t in results:
            if t is None:
                continue
            batch_scenes.append(t)
            ids.append(t.get("scan_id", ""))
            if len(batch_scenes) == batch_size:
                pb = points_to_batch_np(batch_scenes, voxel_scale=vc.scale)
                yield LoaderBatch(points=pb, scan_ids=ids, scenes=batch_scenes,
                                  batch_size=batch_size)
                batch_scenes, ids = [], []
        if batch_scenes and not drop_last:
            pb = points_to_batch_np(batch_scenes, voxel_scale=vc.scale)
            yield LoaderBatch(points=pb, scan_ids=ids, scenes=batch_scenes,
                              batch_size=len(batch_scenes))

    if num_workers <= 0:
        yield from emit(
            _prep_scene(dataset, training, vc, seed, epoch, i) for i in order)
        return

    import multiprocessing as mp
    from collections import deque
    from concurrent.futures import ProcessPoolExecutor

    ctx = mp.get_context("fork")
    window = max(num_workers, batch_size * prefetch_batches)
    with ProcessPoolExecutor(
        max_workers=num_workers, mp_context=ctx,
        initializer=_worker_init, initargs=(dataset, training, vc, seed, epoch),
    ) as pool:
        def results():
            pending: deque = deque()
            it = iter(order)
            for i in it:
                pending.append(pool.submit(_worker_prep, int(i)))
                if len(pending) >= window:
                    break
            while pending:
                fut = pending.popleft()
                nxt = next(it, None)
                if nxt is not None:
                    pending.append(pool.submit(_worker_prep, int(nxt)))
                yield fut.result()

        yield from emit(results())
