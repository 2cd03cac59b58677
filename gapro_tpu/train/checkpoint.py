"""Checkpoint save/load with the reference's retention policy.

Reference semantics (ISBNet/isbnet/util/utils.py:87-148):
  * `latest` always updated; epoch checkpoints kept when the epoch is a
    power of two or a multiple of save_freq, otherwise pruned;
  * `best` saved on metric improvement;
  * loading tolerates missing / shape-mismatched keys (partial loading for
    backbone-pretrain -> full-model, and for fixed_modules fine-tuning).

Storage is orbax PyTreeCheckpointer (TPU-native async-capable layout).
"""

from __future__ import annotations

import os
import os.path as osp
import shutil
from typing import Any, Optional

import jax
import numpy as np


def _ckpt():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def _is_keep_epoch(epoch: int, save_freq: int) -> bool:
    return epoch % save_freq == 0 or (epoch & (epoch - 1)) == 0


def save_checkpoint(work_dir: str, state_tree: Any, epoch: int,
                    save_freq: int = 16, best: bool = False) -> str:
    """Save `state_tree` (any pytree: params/batch_stats/opt_state/...)."""
    os.makedirs(work_dir, exist_ok=True)
    cp = _ckpt()
    path = osp.join(work_dir, f"epoch_{epoch:05d}")
    if osp.exists(path):
        shutil.rmtree(path)
    cp.save(path, state_tree)

    latest = osp.join(work_dir, "latest")
    if osp.islink(latest) or osp.exists(latest):
        if osp.islink(latest):
            os.unlink(latest)
        else:
            shutil.rmtree(latest)
    os.symlink(f"epoch_{epoch:05d}", latest)

    if best:
        bestp = osp.join(work_dir, "best")
        if osp.exists(bestp):
            shutil.rmtree(bestp)
        cp.save(bestp, state_tree)

    # prune: previous epoch dir unless it's a keep epoch
    prev = epoch - 1
    prev_path = osp.join(work_dir, f"epoch_{prev:05d}")
    if prev > 0 and not _is_keep_epoch(prev, save_freq) and osp.exists(prev_path):
        shutil.rmtree(prev_path)
    return path


def load_checkpoint(path: str, target_tree: Any = None,
                    strict: bool = False) -> Any:
    """Restore a checkpoint. With `target_tree` given and strict=False,
    merges leaves whose shapes match and keeps the target's value otherwise
    (the reference's size-mismatch skip, utils.py:115-148)."""
    path = osp.realpath(path)
    cp = _ckpt()
    restored = cp.restore(path)
    if target_tree is None or strict:
        return restored

    flat_t, treedef = jax.tree_util.tree_flatten_with_path(target_tree)
    flat_r = dict(jax.tree_util.tree_flatten_with_path(restored)[0])
    merged = []
    skipped = []
    for keypath, tval in flat_t:
        rval = flat_r.get(keypath)
        if rval is not None and np.shape(rval) == np.shape(tval):
            merged.append(rval)
        else:
            merged.append(tval)
            skipped.append(jax.tree_util.keystr(keypath))
    if skipped:
        import logging

        logging.getLogger(__name__).info(
            "load_checkpoint: kept %d target leaves (missing/mismatched): %s",
            len(skipped), ", ".join(skipped[:8]),
        )
    return jax.tree_util.tree_unflatten(treedef, merged)


def latest_checkpoint(work_dir: str) -> Optional[str]:
    latest = osp.join(work_dir, "latest")
    return latest if osp.exists(latest) else None
