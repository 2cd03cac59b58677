"""Connected components over point adjacency (TPU-native label propagation).

Replaces the reference's PointGroup-style clustering: GPU ball query builds
an adjacency list, then a CPU BFS finds components
(ISBNet/isbnet/ops/src/bfs_cluster/bfs_cluster.cpp:50-143; SPFormer's
semantic-constrained variant spformer/lib/pointgroup_ops/src/bfs_cluster/).

TPU formulation: iterative min-label propagation (pointer jumping) over the
fixed-k ball-query neighbor table — O(log N) hops since each sweep also
jumps through the current label's own label. Fully static shapes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .ballquery import ball_query_masked


@partial(jax.jit, static_argnums=(2,))
def connected_components(nbr_idx, valid, max_iters: int = 32):
    """[N, K] neighbor table (-1 = none) -> [N] component labels.

    Labels are the min point index in the component; invalid points get -1.
    """
    n = nbr_idx.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    label0 = idx  # invalid rows self-label; nothing valid points at them

    def body(state):
        label, _, it = state
        safe = jnp.where(nbr_idx >= 0, nbr_idx, idx[:, None])
        nbr_lab = label[safe]  # [N, K]
        new = jnp.minimum(label, jnp.min(nbr_lab, axis=1))
        new = jnp.minimum(new, new[new])  # pointer jump
        return new, jnp.any(new != label), it + 1

    def cond(state):
        return state[1] & (state[2] < max_iters)

    label, _, _ = jax.lax.while_loop(
        cond, body, (label0, jnp.bool_(True), jnp.int32(0))
    )
    return jnp.where(valid, label, -1)


@partial(jax.jit, static_argnums=(4, 5))
def cluster_points(xyz, valid, semantic, radius, k: int = 16,
                   min_points: int = 50):
    """PointGroup-style semantic-constrained clustering on one scene.

    xyz [N,3]; semantic [N] class ids; neighbors within `radius` sharing the
    semantic class are connected. Returns (labels [N] compacted by min-index,
    sizes [N] per point's cluster size); clusters smaller than `min_points`
    get label -1 (bfs_cluster.cpp's threshold).
    """
    n = xyz.shape[0]
    nbr, _ = ball_query_masked(
        xyz[None], xyz[None], valid[None], valid[None], radius, k
    )
    nbr = nbr[0]
    same = jnp.where(
        nbr >= 0, semantic[jnp.maximum(nbr, 0)] == semantic[:, None], False
    )
    nbr = jnp.where(same, nbr, -1)
    labels = connected_components(nbr, valid)
    ones = jnp.ones((n,), jnp.int32)
    sizes_per_label = jax.ops.segment_sum(
        jnp.where(labels >= 0, ones, 0), jnp.maximum(labels, 0), num_segments=n
    )
    sizes = jnp.where(labels >= 0, sizes_per_label[jnp.maximum(labels, 0)], 0)
    labels = jnp.where(sizes >= min_points, labels, -1)
    return labels, sizes
