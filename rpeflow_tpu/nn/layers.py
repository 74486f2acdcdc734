"""Basic conv/MLP building blocks (channels-last).

TPU-native equivalents of reference models/utils.py:7-98
(Conv1dNormRelu / Conv2dNormRelu / MLP1d / MLP2d). Points live as
``[B, N, C]`` and images as ``[B, H, W, C]``; a single wrapper covers both
(1-D convs with kernel 1 are just pointwise convs over the N axis).

Module/parameter names intentionally mirror the torch attribute names
(``conv_fn``, ``norm_fn``) so checkpoint conversion is a mechanical
name-and-transpose mapping (see rpeflow_tpu/compat/torch_loader.py).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

# torch's default conv init: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)).
torch_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")

Dtype = Any


def apply_activation(x: jnp.ndarray, activation: Optional[str]) -> jnp.ndarray:
    if activation is None:
        return x
    if activation == "relu":
        return nn.relu(x)
    if activation == "leaky_relu":
        return nn.leaky_relu(x, negative_slope=0.1)
    raise NotImplementedError(f"Unknown activation function: {activation}")


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Parameter-free instance norm (torch InstanceNorm default: affine=False).

    Normalizes each channel over the spatial axes of each sample.
    """
    axes = tuple(range(1, x.ndim - 1))
    mu = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps)


class ConvNormAct(nn.Module):
    """Conv -> (batch|instance|no) norm -> (leaky_)relu, channels-last.

    Works for both 2-D (``[B, H, W, C]``) and 1-D/point (``[B, N, C]``)
    inputs; ``kernel_size`` is applied over all non-batch, non-channel axes.
    Mirrors reference models/utils.py:7-64.
    """

    out_channels: int
    kernel_size: int = 1
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    norm: Optional[str] = None
    activation: Optional[str] = "leaky_relu"
    use_bias: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        n_spatial = x.ndim - 2
        x = nn.Conv(
            features=self.out_channels,
            kernel_size=(self.kernel_size,) * n_spatial,
            strides=(self.stride,) * n_spatial,
            padding=((self.padding, self.padding),) * n_spatial,
            kernel_dilation=(self.dilation,) * n_spatial,
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            dtype=self.dtype,
            name="conv_fn",
        )(x)
        if self.norm == "batch_norm":
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                name="norm_fn",
            )(x)
        elif self.norm == "instance_norm":
            x = instance_norm(x)
        elif self.norm is not None:
            raise NotImplementedError(f"Unknown normalization function: {self.norm}")
        return apply_activation(x, self.activation)


class MLP(nn.Module):
    """Stack of pointwise ConvNormAct layers (reference MLP1d/MLP2d).

    Submodules are named ``convs_i`` to mirror the torch ``convs.{i}`` list.
    """

    mlps: Sequence[int]
    norm: Optional[str] = None
    activation: Optional[str] = "leaky_relu"
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i, out_ch in enumerate(self.mlps):
            x = ConvNormAct(
                out_ch,
                norm=self.norm,
                activation=self.activation,
                dtype=self.dtype,
                name=f"convs_{i}",
            )(x, train=train)
        return x
