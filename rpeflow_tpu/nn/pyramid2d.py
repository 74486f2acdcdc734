"""2D (IRR-PWC) branch: feature pyramid, flow estimator, context network.

TPU-native equivalents of reference models/pwc2d_core.py:6-151
(ResidualBlock / FeaturePyramid2D / FlowEstimator2D / ContextNetwork2D).
Channels-last; convolutions run on the MXU via XLA.
"""

from __future__ import annotations

import os as _os
from typing import Any, List, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import ConvNormAct, space_to_depth2, torch_kernel_init


class ResidualBlock(nn.Module):
    """Stride-2 residual block (reference models/pwc2d_core.py:6-25).

    ``s2d``: evaluate the two stride-2 convs over a space-to-depth packing
    of the input (identical math, canonical params — see layers._S2DConv).
    Used for the first block only, where the tiny input channel count (RGB
    3 / event 20) at full resolution forces XLA into transposed layouts and
    full-res copies, and the stride-2 backward is a dilated conv.
    """

    out_channels: int
    norm: Optional[str] = None
    dtype: Any = None
    s2d: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.s2d:
            x = space_to_depth2(x)
        down = ConvNormAct(self.out_channels, kernel_size=1, stride=2,
                           norm=self.norm, activation=None, dtype=self.dtype,
                           s2d_input=self.s2d, name="down0")(x, train=train)
        out = ConvNormAct(self.out_channels, kernel_size=3, stride=2, padding=1,
                          norm=self.norm, dtype=self.dtype, s2d_input=self.s2d,
                          name="conv0")(x, train=train)
        out = ConvNormAct(self.out_channels, kernel_size=3, stride=1, padding=1,
                          norm=self.norm, activation=None, dtype=self.dtype,
                          name="conv1")(out, train=train)
        return nn.leaky_relu(out + down, negative_slope=0.1)


class FeaturePyramid2D(nn.Module):
    """6-level stride-2..64 pyramid (reference models/pwc2d_core.py:28-40).

    Blocks are rematerialized: saving every intra-block conv activation for
    the backward pass costs ~2 GB at 576x960 (XLA pads the wide low-channel
    maps up to 8x); recomputing them is far cheaper than spilling HBM.
    """

    n_channels: Sequence[int]
    norm: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        outputs = []
        block = nn.remat(ResidualBlock, static_argnums=(2,))
        # Number of leading blocks whose stride-2 convs run over an s2d
        # packing (0 disables; RPEFLOW_NO_S2D is the legacy off switch).
        # Default 1: block 0 is where the tiny-Cin full-res layout waste
        # lives; deeper blocks measured neutral (PERF.md).
        n_s2d = (0 if _os.environ.get("RPEFLOW_NO_S2D")
                 else int(_os.environ.get("RPEFLOW_S2D_BLOCKS", "1")))
        for i, out_ch in enumerate(self.n_channels[1:]):
            x = block(out_ch, norm=self.norm, dtype=self.dtype,
                      s2d=(i < n_s2d),
                      name=f"pyramid_convs_{i}")(x, train)
            outputs.append(x)
        return outputs


class FlowEstimator2D(nn.Module):
    """5-conv flow-feature estimator (reference models/pwc2d_core.py:91-137).

    Returns the concatenated feature of the last two convs
    (``flow_feat_dim = n_channels[4] + n_channels[5]``); the final 2-channel
    prediction conv lives in the core model (``conv_last_2d``).
    """

    n_channels: Sequence[int]
    norm: Optional[str] = None
    dtype: Any = None

    @property
    def flow_feat_dim(self) -> int:
        return self.n_channels[4] + self.n_channels[5]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i, out_ch in enumerate(self.n_channels[1:5]):
            x = ConvNormAct(out_ch, kernel_size=3, padding=1, norm=self.norm,
                            dtype=self.dtype, name=f"conv{i + 1}")(x, train=train)
        x5 = ConvNormAct(self.n_channels[5], kernel_size=3, padding=1, norm=self.norm,
                         dtype=self.dtype, name="conv5")(x, train=train)
        return jnp.concatenate([x5, x], axis=-1)


class ContextNetwork2D(nn.Module):
    """Dilated-conv context refinement (reference models/pwc2d_core.py:139-151)."""

    n_channels: Sequence[int]
    dilations: Sequence[int]
    norm: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        for i, (out_ch, dil) in enumerate(zip(self.n_channels[1:], self.dilations)):
            x = ConvNormAct(out_ch, kernel_size=3, padding=dil, dilation=dil,
                            norm=self.norm, dtype=self.dtype,
                            name=f"convs_{i}")(x, train=train)
        out = nn.Conv(2, kernel_size=(3, 3), padding=((1, 1), (1, 1)),
                      kernel_init=torch_kernel_init, dtype=self.dtype,
                      name="conv_last")(x)
        return x, out


class UpMaskHead2D(nn.Module):
    """RAFT convex-upsample mask head (reference models/RPEFlow_core.py:208-212).

    Torch builds this as an ``nn.Sequential``; submodules are named
    ``layers_0`` / ``layers_2`` to mirror the sequential indices.
    """

    scale_factor: int = 4
    hidden: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.hidden, kernel_size=(3, 3), padding=((1, 1), (1, 1)),
                    kernel_init=torch_kernel_init, dtype=self.dtype,
                    name="layers_0")(x)
        x = nn.relu(x)
        s = self.scale_factor
        from .mdta import _pw_conv
        return _pw_conv(s * s * 9, True, self.dtype, "layers_2", 2)(x)
