"""Sparse residual U-Net backbone (flax.linen).

Architecture follows the reference backbone shared by ISBNet and SPFormer
(ISBNet/isbnet/model/blocks.py:169-255): a SubMConv stem, then a recursive
UBlock — per level: 2 pre-activation residual blocks, stride-2 down conv,
recurse, inverse conv, concat skip, 2 tail residual blocks.  Channels grow
linearly (c, 2c, ..., 7c).  BatchNorm eps 1e-4, momentum 0.1 (torch
convention), masked to valid voxels.

All convs consume the precomputed :class:`~gapro_tpu.sparse.plan.UNetPlan`
(the indice_key analog): geometry is computed once, weights are pure GEMMs.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .conv import down_conv, inverse_conv, subm_conv_auto
from .plan import UNetPlan


def _bn(name=None):
    return nn.BatchNorm(
        use_running_average=None,
        momentum=0.9,  # torch momentum 0.1
        epsilon=1e-4,
        name=name,
    )


_KAIMING = nn.initializers.variance_scaling(2.0, "fan_in", "uniform")


class SubMConv(nn.Module):
    """3x3x3 submanifold conv over a level's neighbor table."""

    features: int

    @nn.compact
    def __call__(self, feats, level_plan):
        w = self.param("kernel", _KAIMING, (27, feats.shape[-1], self.features))
        return subm_conv_auto(feats, level_plan, w)


class Conv1x1(nn.Module):
    """1x1 sparse conv == plain dense projection on valid rows
    (reference Custom1x1Subm3d, blocks.py:158-166)."""

    features: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, feats, valid):
        y = nn.Dense(self.features, use_bias=self.use_bias, kernel_init=_KAIMING)(feats)
        return jnp.where(valid[:, None], y, 0.0)


class ResidualBlock(nn.Module):
    """Pre-activation sparse residual block (blocks.py:169-195)."""

    features: int

    @nn.compact
    def __call__(self, feats, level_plan, train: bool):
        valid = level_plan.grid.valid
        mask = valid[:, None]
        if feats.shape[-1] == self.features:
            identity = feats
        else:
            identity = Conv1x1(self.features, name="i_branch")(feats, valid)

        x = _bn(name="bn0")(feats, use_running_average=not train, mask=mask)
        x = nn.relu(x)
        x = SubMConv(self.features, name="conv0")(x, level_plan)
        x = _bn(name="bn1")(x, use_running_average=not train, mask=mask)
        x = nn.relu(x)
        x = SubMConv(self.features, name="conv1")(x, level_plan)
        return x + identity


class UBlock(nn.Module):
    """Recursive U-Net over the level hierarchy (blocks.py:198-255)."""

    n_planes: Sequence[int]  # channels per level, e.g. (32, 64, ..., 224)
    block_reps: int = 2

    @nn.compact
    def __call__(self, feats, plan: UNetPlan, level: int, train: bool):
        lp = plan.levels[level]
        c = self.n_planes[0]

        x = feats
        for i in range(self.block_reps):
            x = ResidualBlock(c, name=f"block{i}")(x, lp, train)
        identity = x

        if len(self.n_planes) > 1:
            y = _bn(name="conv_bn")(x, use_running_average=not train, mask=lp.grid.valid[:, None])
            y = nn.relu(y)
            w_down = self.param("down_kernel", _KAIMING, (8, c, self.n_planes[1]))
            y = down_conv(y, lp.down_child, w_down,
                          out_valid=plan.levels[level + 1].grid.valid)

            y = UBlock(self.n_planes[1:], self.block_reps, name="u")(y, plan, level + 1, train)

            y = _bn(name="deconv_bn")(
                y, use_running_average=not train, mask=plan.levels[level + 1].grid.valid[:, None]
            )
            y = nn.relu(y)
            w_up = self.param("up_kernel", _KAIMING, (8, self.n_planes[1], c))
            y = inverse_conv(y, lp.parent, lp.offset_id, w_up, lp.grid.valid)

            x = jnp.concatenate([identity, y], axis=1)
            for i in range(self.block_reps):
                x = ResidualBlock(c, name=f"tail_block{i}")(x, lp, train)
        return x


class SparseUNetBackbone(nn.Module):
    """input SubMConv stem + UBlock + output BN/ReLU
    (ISBNet/isbnet/model/isbnet.py:89-94)."""

    channels: int = 32
    num_blocks: int = 7
    in_channels: int = 6

    @nn.compact
    def __call__(self, feats, plan: UNetPlan, train: bool = False):
        planes = tuple(self.channels * (i + 1) for i in range(self.num_blocks))
        x = SubMConv(self.channels, name="input_conv")(feats, plan.levels[0])
        x = UBlock(planes, name="unet")(x, plan, 0, train)
        x = _bn(name="output_bn")(
            x, use_running_average=not train, mask=plan.levels[0].grid.valid[:, None]
        )
        x = nn.relu(x)
        return jnp.where(plan.levels[0].grid.valid[:, None], x, 0.0)
