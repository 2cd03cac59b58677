"""Instance-aware local aggregator (ISBNet/isbnet/model/aggregator.py).

Two-stage point sampling/grouping producing instance queries:
FPS -> ball-query neighborhoods -> [rel-xyz, rel-box-dims, feats] ->
SharedMLP + max-pool (x2 stages) -> bottleneck MLP + skip.

TPU layout: dense [B, N, ...] with validity masks throughout (the
reference's batch-flat stage-1 path and dense stage-2 path collapse into
one masked dense implementation).
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.ballquery import ball_query_masked
from ..ops.fps import fps
from .common import ConvBlock1d, SharedMLP


class AggregatorOutput(NamedTuple):
    locs: jax.Array  # [B, S, 3]
    feats: jax.Array  # [B, S, C]
    boxes: jax.Array  # [B, S, 6]
    inds: jax.Array  # [B, S] indices into the input N axis
    valid: jax.Array  # [B, S]


def _group(values, nbr_idx):
    """values [B, N, C], nbr_idx [B, Q, K] -> [B, Q, K, C]."""
    return jax.vmap(lambda v, i: v[i])(values, nbr_idx)


class LocalAggregator(nn.Module):
    mlp_dim: int = 32
    n_sample: int = 1024
    radius: float = 0.4
    n_neighbor: int = 64
    n_neighbor_post: int = 64

    @nn.compact
    def __call__(self, locs, feats, boxes, valid, train: bool = False,
                 sampled_before: bool = False, n_sample: int | None = None):
        """All inputs dense: locs [B,N,3], feats [B,N,C], boxes [B,N,6], valid [B,N].

        ``n_sample`` overrides the module default (the iterative-sampling
        inference loop calls the same aggregator with shrinking sample
        counts, reference isbnet.py:585-587; params are shared since none
        depend on n_sample)."""
        b, n, _ = locs.shape
        ns = self.n_sample if n_sample is None else n_sample
        dim_boxes = boxes[..., 3:] - boxes[..., :3]

        if sampled_before:
            fps_inds = jnp.tile(jnp.arange(ns, dtype=jnp.int32)[None], (b, 1))
            s_valid = valid[:, :ns]
        else:
            fps_inds, s_valid = fps(locs, valid, ns)

        take = lambda v: jax.vmap(lambda x, i: x[i])(v, fps_inds)
        fps_locs = take(locs)
        fps_dims = take(dim_boxes)
        fps_boxes = take(boxes)

        # ---- stage 1: neighborhoods over all input points ----
        nbr, _ = ball_query_masked(fps_locs, locs, s_valid, valid, self.radius, self.n_neighbor)
        g_xyz = (_group(locs, nbr) - fps_locs[:, :, None, :]) / self.radius
        g_dim = jnp.abs(_group(dim_boxes, nbr) - fps_dims[:, :, None, :])
        g_feat = jnp.concatenate([g_xyz, g_dim, _group(feats, nbr)], axis=-1)

        c = self.mlp_dim
        # reference mlp_spec1 = [c(+6), c, 2c] -> two conv+bn+relu layers
        x = SharedMLP((c, 2 * c), name="mlp1")(g_feat, valid=s_valid[:, :, None], train=train)
        x = jnp.max(x, axis=2)  # [B, S, 2c]
        identity = x

        # ---- stage 2: neighborhoods among the sampled points ----
        nbr2, _ = ball_query_masked(
            fps_locs, fps_locs, s_valid, s_valid, 2 * self.radius, self.n_neighbor_post
        )
        g2_xyz = (_group(fps_locs, nbr2) - fps_locs[:, :, None, :]) / (2 * self.radius)
        g2_dim = jnp.abs(_group(fps_dims, nbr2) - fps_dims[:, :, None, :])
        g2_feat = jnp.concatenate([g2_xyz, g2_dim, _group(x, nbr2)], axis=-1)

        y = SharedMLP((2 * c,), final_activation=False, name="mlp2")(
            g2_feat, valid=s_valid[:, :, None], train=train
        )
        y = jnp.max(y, axis=2)

        # ---- bottleneck + skip ----
        y = ConvBlock1d(2 * c * 4, name="mlp3a")(y, valid=s_valid, train=train)
        y = ConvBlock1d(2 * c, activation=False, name="mlp3b")(y, valid=s_valid, train=train)
        out = nn.relu(y + identity)
        out = jnp.where(s_valid[..., None], out, 0.0)

        return AggregatorOutput(locs=fps_locs, feats=out, boxes=fps_boxes, inds=fps_inds, valid=s_valid)
