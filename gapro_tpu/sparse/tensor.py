"""Static-shape sparse voxel grid container.

The TPU-native stand-in for spconv's ``SparseConvTensor``
(used at ISBNet/isbnet/model/blocks.py:183-233): a fixed-capacity set of
active voxels — coordinates, validity mask, and a static spatial shape.
Features are carried *separately* through the network (pure functional
style); the grid itself only describes geometry and is reused by every conv
at the same level (the analog of spconv ``indice_key`` sharing).

Invariant: valid voxel coords are sorted lexicographically by
(batch, z, y, x) and occupy the first ``num_voxels`` rows.
"""

from __future__ import annotations

from typing import Tuple

import flax.struct
import jax


@flax.struct.dataclass
class SparseGrid:
    coords: jax.Array  # [V, 4] int32 (batch, z, y, x), -1 padded
    valid: jax.Array  # [V] bool
    num_voxels: jax.Array  # scalar int32
    spatial_shape: Tuple[int, int, int] = flax.struct.field(pytree_node=False)
    batch_size: int = flax.struct.field(pytree_node=False)

    @property
    def capacity(self) -> int:
        return self.coords.shape[0]
