"""Restormer-style MDTA cross-attention blocks (channels-last).

TPU-native equivalents of reference models/restormer_arch.py:32-108 and
169-302 (only the classes the model actually uses: channel LayerNorm, GDFN
feed-forward, Mutual_Attention2D/3D, CrossTransformerBlock2D/3D).

The attention is *transposed* (C x C attention over HW or N tokens), so the
two matmuls are ``[c, T] @ [T, c]`` and ``[c, c] @ [c, T]`` with a large
token count T — an excellent MXU shape. Attention math runs in float32.
"""

from __future__ import annotations

import functools
import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import PointwiseConv, _conv1x1_einsum, torch_kernel_init


def _pw_conv(features, use_bias, dtype, name, n_spatial):
    """Pointwise conv module for the MDTA/GDFN blocks: nn.Conv by default;
    the einsum form (layers.PointwiseConv, parameter-compatible — see
    layers._conv1x1_einsum for the relayout-copy rationale and quarantine)
    under RPEFLOW_CONV1X1_EINSUM=fuser (these sites only) or =1 (global)."""
    if _conv1x1_einsum() in ("all", "fuser"):
        return PointwiseConv(features, use_bias=use_bias, dtype=dtype,
                             name=name)
    return nn.Conv(features, kernel_size=(1,) * n_spatial, use_bias=use_bias,
                   kernel_init=torch_kernel_init, dtype=dtype, name=name)


def _gdfn_ref(x, w_in, w_dw, w_out):
    """XLA composition of the GDFN math on flat kernels (backward oracle)."""
    hidden = w_in.shape[1] // 2
    h = jnp.einsum("bhwc,cd->bhwd", x, w_in)
    hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros_like(h)
    height, width = x.shape[1:3]
    for di in range(3):
        for dj in range(3):
            acc = acc + hp[:, di:di + height, dj:dj + width, :] * w_dw[di, dj]
    g = nn.gelu(acc[..., :hidden], approximate=False) * acc[..., hidden:]
    return jnp.einsum("bhwd,dc->bhwc", g, w_out)


@jax.custom_vjp
def _gdfn_fused(x, w_in, w_dw, w_out):
    """Pallas fused GDFN forward (3.1x over the XLA chain on TPU) with the
    XLA composition as the backward — training gradients are unchanged while
    both the forward pass and remat recomputation take the fused path."""
    import os

    from ..ops.pallas import maybe_barrier
    from ..ops.pallas.gdfn import gdfn_pallas

    x, w_in, w_dw, w_out = maybe_barrier((x, w_in, w_dw, w_out))
    pal = maybe_barrier(gdfn_pallas(x, w_in, w_dw, w_out))
    if os.environ.get("RPEFLOW_PALLAS_DEBUG_DISCARD", "").strip().lower() \
            not in ("", "0", "false", "no", "off"):
        # Triage mode: EXECUTE the custom call but return the XLA reference
        # value (the barrier keeps the kernel alive against DCE). With the
        # zero-write mode (gdfn.py:_debug_zero) this separates the two
        # remaining corruption theories: if this run is finite, consumers
        # of the custom-call OUTPUT read a broken buffer (race/aliasing on
        # the result); if it still NaNs, the kernel's execution clobbers
        # unrelated live memory.
        ref = _gdfn_ref(x, w_in, w_dw, w_out)
        pal, ref = jax.lax.optimization_barrier((pal, ref))
        return ref
    return pal


def _gdfn_fwd(x, w_in, w_dw, w_out):
    return _gdfn_fused(x, w_in, w_dw, w_out), (x, w_in, w_dw, w_out)


def _gdfn_bwd(res, g):
    _, vjp = jax.vjp(_gdfn_ref, *res)
    return vjp(g)


_gdfn_fused.defvjp(_gdfn_fwd, _gdfn_bwd)


def _gdfn_fused_ok(x, hidden: int) -> bool:
    from ..ops.pallas import pallas_enabled

    if jax.default_backend() != "tpu" or not pallas_enabled("gdfn"):
        return False
    from ..ops.pallas.gdfn import _pick_tile

    h, w = x.shape[1:3]
    # needs a row tile that fits VMEM; unaligned widths (36x60, 18x30) are
    # zero-padded inside gdfn_pallas (exact — no biases), so the fused path
    # now covers every decode level
    return _pick_tile(h, w, x.shape[-1], hidden) is not None


def _cln_flat(z, weight, bias):
    zf = z.astype(jnp.float32)
    mu = jnp.mean(zf, axis=-1, keepdims=True)
    var = jnp.var(zf, axis=-1, keepdims=True)
    return (zf - mu) / jnp.sqrt(var + 1e-5) * weight + bias


def _dw_bf16() -> bool:
    """bf16 operand reads in the flat depthwise tap sum (trace-time,
    ``RPEFLOW_DW_BF16=1``). Flagship-validated in round 4 for BOTH eval
    (158.9-161.5 ms vs 177.7 f32, finite) and training (653.1 vs 703.6
    ms/step, -7.2%, finite loss) with sub-percent sign-mixed metric
    deltas (triage/quantify_dwbf16.log, triage/validate_default.log
    ``probe-dw-bf16*``). Ships opt-in only because a FRESH compile costs
    15-44 min; bench.py re-earns it as an upgrade rung (warm-cache load
    is seconds), and the cache-priming flow makes it the effective
    default on hosts that have run the bench once.

    XLA materializes the 9-tap accumulation as ~3 read passes over the
    (padded) input; storing that operand as bf16 halves the read bytes
    while the accumulator stays f32 — the same numeric class as the
    reference's grouped depthwise conv, which XLA lowers onto the bf16
    MXU with f32 accumulation (PERF.md "Correctness-affecting perf
    facts"). No conv op is emitted, so the bf16 conv-layout relayout
    storm that makes `amp` slow does not apply.
    """
    import os

    return os.environ.get("RPEFLOW_DW_BF16", "").strip().lower() \
        not in ("", "0", "false", "no", "off")


def _dw_flat(z, taps, kh):
    """Depthwise conv on flat taps ``[kh, 3, C]`` over ``[B, H, W, C]``."""
    b, h, w, c = z.shape
    pad_h = kh // 2
    store = (jnp.bfloat16 if _dw_bf16() and z.dtype == jnp.float32
             else z.dtype)
    # NOTE: no optimization_barrier on the bf16 buffer. The excess-precision
    # convert folding PERF.md warns about does NOT bite here (the A/B
    # measured a real -8.4%, impossible with folded casts), and the barrier
    # variant was measured SLOWER than f32 (249.9 vs 224.0 ms,
    # probe-dw-bf16-barrier — it blocks the pad+cast from fusing into its
    # producer and the tap passes from fusing across it) though it compiles
    # 5x faster (~8 vs ~44 min). Barrier-free is the validated form.
    zp = jnp.pad(z.astype(store), ((0, 0), (pad_h, pad_h), (1, 1), (0, 0)))
    acc = jnp.zeros_like(z)
    for di in range(kh):
        for dj in range(3):
            acc = acc + zp[:, di:di + h, dj:dj + w, :].astype(z.dtype) \
                * taps[di, dj]
    return acc


def _use_grouped_conv() -> bool:
    import os

    return os.environ.get("RPEFLOW_GROUPED_CONV", "").strip().lower() \
        not in ("", "0", "false", "no", "off")


def _dw_impl() -> str:
    """Which grouped-conv-free depthwise form to emit (trace-time).

    ``flat`` (default): the shift-multiply tap sum — exact f32, lowers to
    pad/slice/multiply/add on the VPU, and is the ONLY form the round-3
    flagship-shape bisect validated finite on the current toolchain
    (only-corr + flat depthwise: finite; PERF.md). ``dense``: the
    depthwise kernel embedded in a REGULAR conv whose HWIO kernel is
    ``taps ⊗ eye(C)`` — mathematically identical and MXU-friendly (the
    C× redundant FLOPs are nearly free standalone), but it shipped as the
    round-3 snapshot default WITHOUT a flagship-shape validation run, and
    the round-3 driver bench then measured the full forward NON-FINITE
    with it (bench child 2026-08-20: finite=false at 210.8 ms/batch,
    corr+fps Pallas enabled) — the same context-dependent conv-lowering
    miscompile family that hit the grouped form. Kept as an opt-in
    experiment for future toolchains. ``RPEFLOW_DW_IMPL={dense,flat}``
    overrides (trace-time, like the kill switches).
    """
    import os

    v = os.environ.get("RPEFLOW_DW_IMPL", "").strip().lower()
    return v if v in ("dense", "flat") else "flat"


@jax.custom_vjp
def _dw_single_pass(z4, taps):
    """Pallas single-pass depthwise 3x3 (ops/pallas/dwconv.py) with the flat
    shift-multiply form as the backward oracle — gradients are unchanged
    while the forward (and remat recomputation) stream the map once instead
    of XLA's materialized 9-pass tap accumulation (~9x per-op; PERF.md
    round-3 session-2 profile)."""
    from ..ops.pallas.dwconv import dwconv_pallas

    return dwconv_pallas(z4, taps)


def _dw_single_pass_fwd(z4, taps):
    return _dw_single_pass(z4, taps), (z4, taps)


def _dw_single_pass_bwd(res, g):
    z4, taps = res
    _, vjp = jax.vjp(lambda z, t: _dw_flat(z, t, 3), z4, taps)
    return vjp(g)


_dw_single_pass.defvjp(_dw_single_pass_fwd, _dw_single_pass_bwd)


def _dw_single_pass_ok(z4, kh, dt) -> bool:
    from ..ops.pallas import pallas_enabled

    if kh != 3 or dt != jnp.float32 or jax.default_backend() != "tpu" \
            or not pallas_enabled("dw"):
        return False
    from ..ops.pallas.dwconv import dwconv_ok

    return dwconv_ok(z4.shape)


def _dw_dense(z4, taps, kh):
    """Depthwise conv as a regular conv with a diagonally-masked kernel."""
    c = taps.shape[-1]
    dense = taps[:, :, :, None] * jnp.eye(c, dtype=taps.dtype)
    pad_h = kh // 2
    return jax.lax.conv_general_dilated(
        z4, dense, window_strides=(1, 1),
        padding=((pad_h, pad_h), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _dw_from_params(p, z, n_spatial, dtype):
    """Depthwise conv from registered nn.Conv params via the shift-multiply
    flat form — NO grouped-conv HLO is emitted.

    XLA:TPU's grouped-conv lowering is the locus of a context-dependent
    miscompile family on the current server toolchain: the conv emits
    inf/NaN from capture-verified finite inputs at flagship decode shapes
    whenever the surrounding graph is perturbed (bf16 activations, remat
    off, or Pallas custom calls elsewhere in the graph) while standalone
    repros of the same conv are clean. Bisect evidence: PERF.md round-2
    bf16 bisect and the round-3 capture run both name
    ``corr_feat_fusers_2d_3/fuse/attn/qkv_dwconv`` (feature_group_count
    243) and ``estimator_feat_fuser_3d/fuse/attn/qkv_dwconv`` as first-NaN
    producers with all inputs finite. The flat form lowers to
    pad/slice/multiply/add on the VPU (exact f32, mathematically identical
    tap-sum; it is already the custom-VJP backward oracle) and sidesteps
    the conv lowering entirely. ``RPEFLOW_GROUPED_CONV=1`` restores the
    grouped-conv emission (A/B + repro; read at trace time).
    """
    w = p["kernel"]
    c = w.shape[-1]
    if n_spatial == 1:
        taps = w.reshape(1, w.shape[0], c)
        z4 = z[:, None]
    else:
        taps = w.reshape(w.shape[0], w.shape[1], c)
        z4 = z
    dt = jnp.promote_types(z.dtype, w.dtype) if dtype is None else dtype
    if _dw_single_pass_ok(z4, taps.shape[0], dt) and _dw_impl() == "flat":
        out = _dw_single_pass(z4.astype(dt), taps.astype(dt))
    else:
        form = _dw_dense if _dw_impl() == "dense" else _dw_flat
        out = form(z4.astype(dt), taps.astype(dt), taps.shape[0])
    if "bias" in p:
        out = out + p["bias"].astype(dt)
    return out if n_spatial == 2 else out[:, 0]


def _attn_ref_flat(x, y, ln, dw, temperature, w_out, kh, num_heads):
    """XLA composition of the full LN -> dwconv-qkv -> transposed attention
    -> projection chain on flat weights (backward oracle for the fused path;
    numerically identical to the module composition)."""
    b, h, w, c = x.shape
    xn = _cln_flat(x, ln[0], ln[1])
    yn = _cln_flat(y, ln[2], ln[3])
    q = _dw_flat(xn, dw[..., :c], kh)
    k = _dw_flat(yn, dw[..., c:2 * c], kh)
    v = _dw_flat(yn, dw[..., 2 * c:], kh)

    t, heads, hc = h * w, num_heads, c // num_heads
    q, k, v = (z.reshape(b, t, heads, hc) for z in (q, k, v))
    q = _l2_normalize(q, axis=1)
    k = _l2_normalize(k, axis=1)
    attn = jnp.einsum("bthc,bthd->bhcd", q, k,
                      preferred_element_type=jnp.float32) * temperature
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhcd,bthd->bthc", attn, v,
                     preferred_element_type=jnp.float32)
    return jnp.einsum("btc,co->bto", out.reshape(b, t, c),
                      w_out).reshape(b, h, w, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _mdta_attn_fused(x, y, ln, dw, temperature, w_out, kh, num_heads):
    """Fused MDTA attention (LN + qkv dwconv + transposed attention +
    projection, pre-residual) — Pallas forward, XLA-composition backward.

    The kernel streams x/y once and returns v plus the token-reduced
    accumulators; the l2 normalization folds into the Gram matrix and
    ``(attn @ v) @ w_out`` collapses to one matmul against a precomputed
    block-diagonal matrix (see ops/pallas/mdta.py).
    """
    from ..ops.pallas import maybe_barrier
    from ..ops.pallas.mdta import mdta_qkv_pallas

    b, h, w, c = x.shape
    heads, hc = num_heads, c // num_heads
    x, y, ln, dw = maybe_barrier((x, y, ln, dw))
    v, qk, sq = maybe_barrier(mdta_qkv_pallas(x, y, ln, dw, kh=kh))

    eps = 1e-12
    nq = jnp.sqrt(jnp.maximum(sq[:, 0], eps * eps))  # [B, C]
    nk = jnp.sqrt(jnp.maximum(sq[:, 1], eps * eps))
    logits = qk / (nq[:, :, None] * nk[:, None, :])  # [B, C, C]
    lr = logits.reshape(b, heads, hc, heads, hc)
    blocks = jnp.stack([lr[:, i, :, i, :] for i in range(heads)], axis=1)
    attn = jax.nn.softmax(blocks * temperature, axis=-1)  # [B, heads, hc, hc]

    # out = (attn @ v) @ w_out == v @ (blockdiag_h(attn_h^T) @ w_out)
    bd = jnp.einsum("bhcd,hg->bhdgc", attn,
                    jnp.eye(heads, dtype=attn.dtype))
    m = jnp.einsum("buw,wo->buo", bd.reshape(b, c, c), w_out)
    return jnp.einsum("btc,bco->bto", v.reshape(b, h * w, c),
                      m).reshape(b, h, w, c)


def _mdta_attn_fwd(x, y, ln, dw, temperature, w_out, kh, num_heads):
    out = _mdta_attn_fused(x, y, ln, dw, temperature, w_out, kh, num_heads)
    return out, (x, y, ln, dw, temperature, w_out)


def _mdta_attn_bwd(kh, num_heads, res, g):
    _, vjp = jax.vjp(
        functools.partial(_attn_ref_flat, kh=kh, num_heads=num_heads), *res)
    return vjp(g)


_mdta_attn_fused.defvjp(_mdta_attn_fwd, _mdta_attn_bwd)


def _attn_fused_ok(x_4d) -> bool:
    from ..ops.pallas import pallas_enabled

    if jax.default_backend() != "tpu" or not pallas_enabled("mdta"):
        return False
    from ..ops.pallas.mdta import _pick_tile

    b, h, w, c = x_4d
    kh = 3 if h > 1 else 1
    return _pick_tile(h, w + (-w) % 8, c, kh) is not None


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel axis per token (reference restormer_arch.py:32-83).

    Variance is the biased estimator; eps sits inside the sqrt. ``bias=False``
    gives the BiasFree variant.
    """

    bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (c,))
        xf = x.astype(jnp.float32)
        if self.bias:
            bias = self.param("bias", nn.initializers.zeros, (c,))
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.var(xf, axis=-1, keepdims=True)
            out = (xf - mu) / jnp.sqrt(var + 1e-5) * weight + bias
        else:
            var = jnp.var(xf, axis=-1, keepdims=True)
            out = xf / jnp.sqrt(var + 1e-5) * weight
        return out.astype(x.dtype)


def _l2_normalize(x: jnp.ndarray, axis: int, eps: float = 1e-12) -> jnp.ndarray:
    """torch F.normalize: x / max(||x||_2, eps).

    The clamp sits INSIDE the sqrt: ``x / max(sqrt(s), eps)`` has a NaN
    gradient at s == 0 (d sqrt/ds -> inf, and inf * max's zero cotangent is
    NaN), which poisoned every parameter upstream of a zero k-row. torch's
    F.normalize backward is finite there; ``sqrt(max(s, eps^2))`` matches it
    everywhere except within eps of the boundary.
    """
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    return x / jnp.sqrt(jnp.maximum(sq, eps * eps))


class MutualAttention(nn.Module):
    """Transposed (channel) cross-attention; q from x, k/v from y.

    Reference Mutual_Attention2D (restormer_arch.py:169-204) and
    Mutual_Attention3D (:250-284). Handles both 2-D ``[B, H, W, C]`` and
    point ``[B, N, C]`` inputs (the dwconv kernel is 3x3 or 3 accordingly).
    """

    dim: int
    num_heads: int
    use_bias: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        n_spatial = x.ndim - 2
        c = self.dim
        temperature = self.param(
            "temperature", nn.initializers.ones, (self.num_heads, 1, 1)
        )

        qkv = jnp.concatenate([x, y, y], axis=-1)
        if self.is_initializing() or _use_grouped_conv():
            qkv = nn.Conv(3 * c, kernel_size=(3,) * n_spatial,
                          padding=((1, 1),) * n_spatial,
                          feature_group_count=3 * c,
                          use_bias=self.use_bias,
                          kernel_init=torch_kernel_init,
                          dtype=self.dtype, name="qkv_dwconv")(qkv)
        else:
            qkv = _dw_from_params(self.variables["params"]["qkv_dwconv"],
                                  qkv, n_spatial, self.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        b = x.shape[0]
        t = math.prod(x.shape[1:-1])  # token count (HW or N)
        heads, hc = self.num_heads, c // self.num_heads

        # [B, T, heads, head_c] throughout — the token axis is contracted
        # in-place by the einsums, so no head-major transposes (which cost
        # ~4 ms of layout copies across the 20 blocks at the eval shape).
        def to_heads(z):
            return z.reshape(b, t, heads, hc).astype(jnp.float32)

        q, k, v = to_heads(q), to_heads(k), to_heads(v)
        q = _l2_normalize(q, axis=1)
        k = _l2_normalize(k, axis=1)

        attn = jnp.einsum("bthc,bthd->bhcd", q, k,
                          preferred_element_type=jnp.float32)
        attn = attn * temperature
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhcd,bthd->bthc", attn, v,
                         preferred_element_type=jnp.float32)

        out = out.reshape(x.shape[:-1] + (c,)).astype(x.dtype)
        return _pw_conv(c, self.use_bias, self.dtype, "project_out",
                        n_spatial)(out)


class FeedForward(nn.Module):
    """Gated-DConv feed-forward (GDFN; reference restormer_arch.py:88-108, 227-247)."""

    dim: int
    ffn_expansion_factor: float = 2.66
    use_bias: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n_spatial = x.ndim - 2
        hidden = int(self.dim * self.ffn_expansion_factor)
        c_in = x.shape[-1]
        proj_in = _pw_conv(hidden * 2, self.use_bias, self.dtype,
                           "project_in", n_spatial)
        dwconv = nn.Conv(hidden * 2, kernel_size=(3,) * n_spatial,
                         padding=((1, 1),) * n_spatial,
                         feature_group_count=hidden * 2,
                         use_bias=self.use_bias, kernel_init=torch_kernel_init,
                         dtype=self.dtype, name="dwconv")
        proj_out = _pw_conv(self.dim, self.use_bias, self.dtype,
                            "project_out", n_spatial)

        fused = (n_spatial == 2 and not self.use_bias and self.dtype is None
                 and not self.is_initializing() and _gdfn_fused_ok(x, hidden))
        if fused:
            params = self.variables["params"]
            w_in = params["project_in"]["kernel"].reshape(c_in, hidden * 2)
            w_dw = params["dwconv"]["kernel"].reshape(3, 3, hidden * 2)
            w_out = params["project_out"]["kernel"].reshape(hidden, self.dim)
            return _gdfn_fused(x.astype(jnp.float32), w_in, w_dw, w_out)

        x = proj_in(x)
        if self.is_initializing() or _use_grouped_conv():
            x = dwconv(x)
        else:
            x = _dw_from_params(self.variables["params"]["dwconv"],
                                x, n_spatial, self.dtype)
        x1, x2 = jnp.split(x, 2, axis=-1)
        x = nn.gelu(x1, approximate=False) * x2
        return proj_out(x)


class CrossTransformerBlock(nn.Module):
    """norm -> cross-attn -> residual -> norm -> GDFN -> residual.

    Reference CrossTransformerBlock2D (restormer_arch.py:207-222) and
    CrossTransformerBlock3D (:287-302); hard-coded WithBias LayerNorm and
    2.66 ffn expansion as in the reference.
    """

    dim: int
    num_heads: int
    ffn_expansion_factor: float = 2.66
    use_bias: bool = False
    layer_norm_bias: bool = True  # 'WithBias'
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        assert x.shape == y.shape
        n_sp = x.ndim - 2
        x4 = x if n_sp == 2 else x[:, None]  # point maps as [B, 1, N, C]
        fused = (n_sp in (1, 2) and not self.use_bias
                 and self.layer_norm_bias and self.dtype is None
                 and not self.is_initializing()
                 and _attn_fused_ok(x4.shape))
        if fused:
            p = self.variables["params"]
            c = self.dim
            kh = 3 if n_sp == 2 else 1
            ln = jnp.stack([p["norm1x"]["weight"], p["norm1x"]["bias"],
                            p["norm1y"]["weight"], p["norm1y"]["bias"]])
            dw = p["attn"]["qkv_dwconv"]["kernel"].reshape(kh, 3, 3 * c)
            w_out = p["attn"]["project_out"]["kernel"].reshape(c, c)
            a = _mdta_attn_fused(x4.astype(jnp.float32),
                                 (y if n_sp == 2 else y[:, None]).astype(
                                     jnp.float32),
                                 ln, dw, p["attn"]["temperature"], w_out,
                                 kh, self.num_heads)
            x = x + (a if n_sp == 2 else a[:, 0])
        else:
            xn = ChannelLayerNorm(bias=self.layer_norm_bias, dtype=self.dtype,
                                  name="norm1x")(x)
            yn = ChannelLayerNorm(bias=self.layer_norm_bias, dtype=self.dtype,
                                  name="norm1y")(y)
            x = x + MutualAttention(self.dim, self.num_heads,
                                    use_bias=self.use_bias,
                                    dtype=self.dtype, name="attn")(xn, yn)
        xn2 = ChannelLayerNorm(bias=self.layer_norm_bias, dtype=self.dtype,
                               name="norm2")(x)
        return x + FeedForward(self.dim, self.ffn_expansion_factor,
                               use_bias=self.use_bias, dtype=self.dtype,
                               name="ffn")(xn2)
