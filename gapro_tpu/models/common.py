"""Shared MLP building blocks (flax), mirroring the reference's conventions.

  * ``MLP``        — ISBNet/isbnet/model/blocks.py:137-154: (Linear+BN+ReLU)^
    (n-1) + Linear, final layer init normal(0, 0.01) bias 0.
  * ``GenericMLP`` — blocks.py:51-123: hidden Dense(+BN+act, no bias), output
    Dense (+opt norm/act).
  * ``SharedMLP``  — module_utils.py:9-33: per-point conv stacks
    (Dense + BN + ReLU over the channel axis of [B, Q, K, C] tensors).

All BatchNorms run masked over valid rows (padding-safe), eps 1e-5 default
torch value unless stated, momentum 0.1 (torch) == 0.9 (flax).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

_KAIMING = nn.initializers.variance_scaling(2.0, "fan_in", "uniform")
_KAIMING_NORMAL = nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal")


def bn(momentum=0.9, eps=1e-5, name=None):
    return nn.BatchNorm(use_running_average=None, momentum=momentum, epsilon=eps, name=name)


def _mask_of(x, valid):
    if valid is None:
        return None
    return valid.reshape(valid.shape + (1,) * (x.ndim - valid.ndim))


class MLP(nn.Module):
    """(Dense + BN(eps 1e-4) + ReLU)^(n-1) + Dense; reference MLP head."""

    out_dim: int
    num_layers: int = 2

    @nn.compact
    def __call__(self, x, valid=None, train: bool = False):
        mask = _mask_of(x, valid)
        for i in range(self.num_layers - 1):
            x = nn.Dense(x.shape[-1], kernel_init=nn.initializers.xavier_uniform())(x)
            x = bn(eps=1e-4, name=f"bn{i}")(x, use_running_average=not train, mask=mask)
            x = nn.relu(x)
        x = nn.Dense(
            self.out_dim,
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.zeros,
        )(x)
        if mask is not None:
            x = jnp.where(mask, x, 0.0)
        return x


class GenericMLP(nn.Module):
    hidden_dims: Sequence[int]
    out_dim: int
    use_norm: bool = True
    hidden_use_bias: bool = False
    output_use_bias: bool = True
    output_use_activation: bool = False
    output_use_norm: bool = False

    @nn.compact
    def __call__(self, x, valid=None, train: bool = False):
        mask = _mask_of(x, valid)
        for i, h in enumerate(self.hidden_dims):
            x = nn.Dense(h, use_bias=self.hidden_use_bias, kernel_init=_KAIMING)(x)
            if self.use_norm:
                x = bn(name=f"bn{i}")(x, use_running_average=not train, mask=mask)
            x = nn.relu(x)
        x = nn.Dense(self.out_dim, use_bias=self.output_use_bias, kernel_init=_KAIMING)(x)
        if self.output_use_norm:
            x = bn(name="bn_out")(x, use_running_average=not train, mask=mask)
        if self.output_use_activation:
            x = nn.relu(x)
        if mask is not None:
            x = jnp.where(mask, x, 0.0)
        return x


class SharedMLP(nn.Module):
    """Conv2d(1x1)+BN+ReLU stacks over [..., C] tensors (pointnet-style)."""

    dims: Sequence[int]  # output dims per layer
    final_activation: bool = True

    @nn.compact
    def __call__(self, x, valid=None, train: bool = False):
        mask = _mask_of(x, valid)
        n = len(self.dims)
        for i, d in enumerate(self.dims):
            x = nn.Dense(d, use_bias=False, kernel_init=_KAIMING_NORMAL)(x)
            x = bn(name=f"bn{i}")(x, use_running_average=not train, mask=mask)
            if i < n - 1 or self.final_activation:
                x = nn.relu(x)
        if mask is not None:
            x = jnp.where(mask, x, 0.0)
        return x


class ConvBlock1d(nn.Module):
    """conv_with_kaiming_uniform("BN", activation=True) equivalent
    (blocks.py:322-351): Dense(no bias)+BN+ReLU."""

    out_dim: int
    activation: bool = True

    @nn.compact
    def __call__(self, x, valid=None, train: bool = False):
        mask = _mask_of(x, valid)
        x = nn.Dense(self.out_dim, use_bias=False, kernel_init=_KAIMING)(x)
        x = bn(name="bn")(x, use_running_average=not train, mask=mask)
        if self.activation:
            x = nn.relu(x)
        if mask is not None:
            x = jnp.where(mask, x, 0.0)
        return x
