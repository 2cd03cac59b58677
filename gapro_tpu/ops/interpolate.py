"""k-NN feature interpolation + grouping (pointnet2 lineage, TPU-native).

Replaces the reference CUDA ops `three_nn` / `three_interpolate` /
`gather_points` / `group_points`
(ISBNet/isbnet/pointnet2/_ext_src/src/interpolate_gpu.cu, group_points_gpu.cu;
wrappers pointnet2_utils.py:37-370): distance matrix + top-k + inverse-
distance-weighted gather, all dense masked [B, N] layout.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnums=(4,))
def knn(query_xyz, ref_xyz, query_valid, ref_valid, k: int = 3):
    """[B,Q,3] x [B,N,3] -> (dists [B,Q,k], idx [B,Q,k]) nearest refs."""
    d2 = jnp.sum(
        (query_xyz[:, :, None, :] - ref_xyz[:, None, :, :]) ** 2, axis=-1
    )  # [B, Q, N]
    big = jnp.float32(1e10)
    d2 = jnp.where(ref_valid[:, None, :], d2, big)
    neg, idx = jax.lax.top_k(-d2, k)
    d = jnp.sqrt(jnp.maximum(-neg, 0.0))
    d = jnp.where(query_valid[..., None], d, big)
    return d, idx.astype(jnp.int32)


@jax.jit
def three_interpolate(feats, idx, dists, query_valid, eps: float = 1e-8):
    """Inverse-distance-weighted 3-NN interpolation (interpolate_gpu.cu).

    feats [B,N,C], idx/dists [B,Q,3] -> [B,Q,C].
    """
    w = 1.0 / (dists**2 + eps)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    g = jax.vmap(lambda f, i: f[i])(feats, idx)  # [B,Q,3,C]
    out = jnp.sum(g * w[..., None], axis=2)
    return jnp.where(query_valid[..., None], out, 0.0)


def gather_points(values, idx):
    """values [B,N,...], idx [B,S] -> [B,S,...] (gather_points_gpu.cu)."""
    return jax.vmap(lambda v, i: v[i])(values, idx)


def group_points(values, idx):
    """values [B,N,C], idx [B,Q,K] -> [B,Q,K,C] (group_points_gpu.cu)."""
    return jax.vmap(lambda v, i: v[i])(values, idx)
