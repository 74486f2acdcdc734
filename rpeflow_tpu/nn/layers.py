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

    Normalizes each channel over the spatial axes of each sample. Statistics
    are computed in f32 regardless of input dtype: the fast-variance form
    ``E[x^2] - E[x]^2`` goes NEGATIVE under bf16 at large spatial reductions
    (catastrophic cancellation), and ``sqrt(negative)`` NaNs the whole map.
    """
    xf = x.astype(jnp.float32)
    axes = tuple(range(1, x.ndim - 1))
    mu = jnp.mean(xf, axis=axes, keepdims=True)
    var = jnp.var(xf, axis=axes, keepdims=True)
    return ((xf - mu) / jnp.sqrt(var + eps)).astype(x.dtype)


def space_to_depth2(x: jnp.ndarray) -> jnp.ndarray:
    """``[B, H, W, C] -> [B, H/2, W/2, 4C]``, channel index ``(a*2+b)*C + c``
    for source pixel ``(2Y+a, 2X+b)``. Pairs with ``s2d_input`` convs."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


class _S2DConv(nn.Module):
    """Stride-2 conv evaluated as a stride-1 conv over space-to-depth input.

    TPU first-conv optimization: a k3/s2 (or k1/s2) conv on a small-channel
    full-resolution map (RGB / event voxel) forces XLA into transposed
    layouts and full-res layout copies, and its backward is a dilated conv.
    Over ``space_to_depth2(x)`` the same math is a k2/s1 (or k1/s1) conv at
    half resolution with 4x channels — mathematically identical (the kernel
    is scattered into the s2d channel layout with exact zeros elsewhere).

    The canonical parameter stays ``kernel [k, k, Cin, O]`` (+ ``bias``),
    identical to ``nn.Conv`` — checkpoints and torch conversion are
    unaffected; the s2d kernel is derived at trace time.
    """

    features: int
    kernel_size: int  # 1 (pad 0) or 3 (pad 1) — the only shapes used here
    in_channels: int  # ORIGINAL input channels (before s2d packing)
    use_bias: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, s: jnp.ndarray) -> jnp.ndarray:
        import jax.lax as lax

        k, c, o = self.kernel_size, self.in_channels, self.features
        assert k in (1, 3), "s2d conv only supports k=1/pad=0 and k=3/pad=1"
        assert s.shape[-1] == 4 * c, (
            f"expected space_to_depth2 input with {4 * c} channels, "
            f"got {s.shape[-1]}")
        kernel = self.param("kernel", torch_kernel_init, (k, k, c, o),
                            jnp.float32)
        if self.dtype is not None:
            kernel = kernel.astype(self.dtype)
            s = s.astype(self.dtype)

        if k == 1:
            # out[y,x] = w . in[2y,2x] = w . S[y,x,(a=0,b=0)] — first C chans
            out = lax.conv_general_dilated(
                s[..., :c], kernel, window_strides=(1, 1), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
            # tap (dy,dx) of the original k3/s2/p1 conv reads
            # in[2y+dy-1, 2x+dx-1] = S[y-1+ky, x-1+kx, (a,b)] with
            # dy -> (ky,a): 0->(0,1), 1->(1,0), 2->(1,1) (same for dx)
            wp = jnp.zeros((2, 2, 4 * c, o), kernel.dtype)
            for dy in range(3):
                ky, a = (0, 1) if dy == 0 else (1, dy - 1)
                for dx in range(3):
                    kx, b = (0, 1) if dx == 0 else (1, dx - 1)
                    ch = (a * 2 + b) * c
                    wp = wp.at[ky, kx, ch:ch + c].set(kernel[dy, dx])
            out = lax.conv_general_dilated(
                s, wp, window_strides=(1, 1), padding=((1, 0), (1, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (o,), jnp.float32)
            out = out + (bias.astype(out.dtype) if self.dtype is not None
                         else bias)
        return out


def _conv1x1_einsum() -> str:
    """Scope in which pointwise (1x1, stride 1, groups 1) convs are emitted
    as einsum/dot_general instead of conv_general_dilated (trace-time; OFF
    by default). Returns ``""`` (off), ``"fuser"`` (MDTA/GDFN blocks only,
    ``RPEFLOW_CONV1X1_EINSUM=fuser``) or ``"all"`` (every pointwise conv,
    ``RPEFLOW_CONV1X1_EINSUM=1``).

    Motivation: XLA:TPU assigns conv-specific (batch-minor) layouts to
    every convolution and inserts relayout copies against the surrounding
    channels-last elementwise ops — the round-2 trace counted 3,579
    anonymous sub-0.1 ms activation relayouts (20.5 ms) clustered around
    level-1 convs, and the round-4 trace at 224 ms shows ~0.86 ms copies
    bracketing each fuser ``ffn/project_in`` conv. A pointwise conv is
    just a channel contraction; ``[..., C] @ [C, D]`` dot_general carries
    no layout constraint, so the copies disappear. Same bf16-MXU precision
    class as the conv lowering.

    QUARANTINED OFF (round 4): the GLOBAL flip shipped default-ON in the
    round-3 final snapshot without a flagship-shape validation run; the
    round-3 driver bench measured the full forward NON-FINITE with it in
    BOTH configurations that included it (BENCH_r03.json), and the round-4
    A/B could not even compile it (probe-einsum1x1: forward compile
    exceeded 2700 s vs the default's ~450 s — toxic on compile time
    alone). The ``"fuser"`` scope exists to bound that compile-time
    explosion to the ~60 fuser pointwise convs where the relayout copies
    actually cluster; flip any default only after a finite flagship-shape
    run with it enabled is committed (scripts/validate_default.py,
    triage/).
    """
    import os

    v = os.environ.get("RPEFLOW_CONV1X1_EINSUM", "").strip().lower()
    if v in ("", "0", "false", "no", "off"):
        return ""
    return "fuser" if v == "fuser" else "all"


class PointwiseConv(nn.Module):
    """1x1 conv computed as an einsum, parameter-compatible with ``nn.Conv``.

    The kernel keeps nn.Conv's ``(1,)*n_spatial + (in, out)`` shape (and the
    ``bias`` vector), so checkpoints, the torch converter, and the fused
    Pallas paths that read ``params[...]["kernel"]`` are unaffected.
    """

    features: int
    use_bias: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n_spatial = x.ndim - 2
        kernel = self.param(
            "kernel", torch_kernel_init,
            (1,) * n_spatial + (x.shape[-1], self.features), jnp.float32)
        w = kernel.reshape(x.shape[-1], self.features)
        if self.dtype is None:
            dt = jnp.promote_types(x.dtype, w.dtype)
        else:
            dt = self.dtype
        out = jnp.einsum("...c,cd->...d", x.astype(dt), w.astype(dt))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            out = out + bias.astype(dt)
        return out


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
    # input is space_to_depth2-packed; conv params stay canonical (_S2DConv)
    s2d_input: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        n_spatial = x.ndim - 2
        if self.s2d_input:
            assert self.stride == 2 and n_spatial == 2 and self.groups == 1
            x = _S2DConv(
                features=self.out_channels,
                kernel_size=self.kernel_size,
                in_channels=x.shape[-1] // 4,
                use_bias=self.use_bias,
                dtype=self.dtype,
                name="conv_fn",
            )(x)
        elif (self.kernel_size == 1 and self.stride == 1 and self.padding == 0
              and self.dilation == 1 and self.groups == 1
              and _conv1x1_einsum() == "all"):
            x = PointwiseConv(
                features=self.out_channels,
                use_bias=self.use_bias,
                dtype=self.dtype,
                name="conv_fn",
            )(x)
        else:
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
            # Statistics ALWAYS in f32: under bf16 activations the
            # fast-variance form E[x^2]-E[x]^2 cancels to negative values at
            # full-resolution reductions (576x960xB elements) and
            # sqrt(negative) NaNs the forward — observed on TPU at the
            # flagship eval shape while every small-shape test passed.
            in_dtype = x.dtype
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=jnp.float32,
                name="norm_fn",
            )(x.astype(jnp.float32)).astype(in_dtype)
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
