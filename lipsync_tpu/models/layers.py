"""Shared flax building blocks for the lip-sync model family.

These re-create the *semantics* of the reference's torch modules
(`/root/reference/app/models/visual_encoder.py:7-87`,
`/root/reference/app/models/audio_encoder.py:7-89`,
`nn.MultiheadAttention`, `nn.TransformerEncoderLayer(norm_first=True)`)
in TPU-idiomatic channels-last layouts so XLA can tile convs/matmuls
straight onto the MXU. BatchNorm carries torch-compatible running stats
(momentum 0.1 torch == 0.9 flax, eps 1e-5) so converted checkpoints are
bit-comparable in eval mode.
"""

from __future__ import annotations

import itertools
from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU, matching torch's default ``nn.GELU()``."""
    return nn.gelu(x, approximate=False)


class ShiftMatmulConv(nn.Module):
    """Stride-1 N-D convolution lowered as shift-and-accumulate matmuls.

    XLA's TPU conv emitter tiles poorly when the spatial extent is tiny
    relative to the kernel (the artifact branch runs 3x3x3 convs over a
    3x3 feature map — measured 0.10 MFU, BENCHMARKS.md round-2 profile).
    Summing ``prod(kernel_size)`` shifted views, each contracted with its
    kernel tap as a plain (voxels, C_in) @ (C_in, C_out) matmul, keeps the
    identical math (same FLOPs, no im2col materialization) but maps every
    tap straight onto the MXU.

    Parameter-compatible with ``nn.Conv``: params are ``kernel`` of shape
    ``(*kernel_size, C_in, features)`` and ``bias`` — checkpoints swap
    between lowerings freely.
    """

    features: int
    kernel_size: Sequence[int]
    padding: Sequence[Tuple[int, int]]
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ks = tuple(self.kernel_size)
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (*ks, c_in, self.features)
        )
        kernel = kernel.astype(self.dtype)
        xp = jnp.pad(
            x.astype(self.dtype),
            ((0, 0),) + tuple(self.padding) + ((0, 0),),
        )
        out_shape = tuple(
            xp.shape[1 + i] - ks[i] + 1 for i in range(len(ks))
        )
        out = None
        for taps in itertools.product(*(range(k) for k in ks)):
            sl = xp[
                (slice(None),)
                + tuple(
                    slice(t, t + out_shape[i]) for i, t in enumerate(taps)
                )
                + (slice(None),)
            ]
            w = kernel[taps]  # (C_in, features)
            contrib = jnp.matmul(sl, w)
            out = contrib if out is None else out + contrib
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,)
            )
            out = out + bias.astype(self.dtype)
        return out


class Int8Conv(nn.Module):
    """Inference-time int8 N-D convolution (channels-last).

    Post-training dynamic quantization: activations quantize per tensor
    and weights per output channel (symmetric, no zero point), the
    convolution runs int8 x int8 -> int32 — the MXU's int8 path peaks at
    2x its bf16 FLOP/s on v5e — and the result dequantizes with one fused
    multiply. Params are IDENTICAL to ``nn.Conv`` (fp ``kernel`` +
    ``bias``): any trained/converted checkpoint loads unchanged, and the
    weight-quantization arithmetic constant-folds at jit time because the
    engine closes over the parameters.

    This is an opt-in serving lowering (``ModelConfig.conv_lowering`` /
    ``ScoringEngine(quantized_int8=True)``), NOT a training path.

    Note: the activation scale is per TENSOR, so a window's quantization
    grid depends (weakly) on its batch-mates — the same window scored in
    two different batches can differ by up to a quantization step. The
    measured end-to-end spread sits at the bf16 noise floor
    (tests/test_ops.py), but bit-exact repeatability across batch
    compositions is only guaranteed by the default fp lowering.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    padding: Sequence[Tuple[int, int]]
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ks = tuple(self.kernel_size)
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (*ks, c_in, self.features)
        )
        k32 = kernel.astype(jnp.float32)
        w_scale = jnp.max(
            jnp.abs(k32), axis=tuple(range(k32.ndim - 1))
        ) / 127.0
        w_scale = jnp.maximum(w_scale, 1e-12)
        k_q = jnp.clip(jnp.round(k32 / w_scale), -127, 127).astype(jnp.int8)

        x32 = x.astype(jnp.float32)
        x_scale = jnp.maximum(jnp.max(jnp.abs(x32)) / 127.0, 1e-12)
        x_q = jnp.clip(jnp.round(x32 / x_scale), -127, 127).astype(jnp.int8)

        spatial = "DHW"[3 - len(ks):]  # "W" / "HW" / "DHW"
        dn = jax.lax.conv_dimension_numbers(
            x_q.shape, k_q.shape,
            (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C"),
        )
        y = jax.lax.conv_general_dilated(
            x_q, k_q,
            window_strides=tuple(self.strides),
            padding=tuple(self.padding),
            dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        )
        out = y.astype(jnp.float32) * (x_scale * w_scale)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,)
            )
            out = out + bias.astype(jnp.float32)
        return out.astype(self.dtype)


class ConvBNAct(nn.Module):
    """Conv -> BatchNorm -> activation, N-dimensional (channels-last).

    Mirrors `_Conv3dBNReLU` / `_ConvBNReLU` in the reference
    (visual_encoder.py:7-31, audio_encoder.py:7-31).

    ``lowering="shift_matmul"`` routes the conv through
    :class:`ShiftMatmulConv` (identical params/math; MXU-friendly for
    tiny-spatial inputs). Requires stride 1. ``lowering="int8"`` routes
    through :class:`Int8Conv` (quantized inference; same param tree).
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    padding: Sequence[Tuple[int, int]]
    use_bias: bool = False
    act: Callable[[jnp.ndarray], jnp.ndarray] | None = nn.relu
    dtype: Dtype = jnp.float32
    lowering: str = "conv"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.lowering == "shift_matmul":
            assert all(s == 1 for s in self.strides), (
                "shift_matmul lowering supports stride 1 only"
            )
            x = ShiftMatmulConv(
                self.features,
                kernel_size=tuple(self.kernel_size),
                padding=tuple(self.padding),
                use_bias=self.use_bias,
                dtype=self.dtype,
                name="conv",
            )(x)
        elif self.lowering == "int8":
            x = Int8Conv(
                self.features,
                kernel_size=tuple(self.kernel_size),
                strides=tuple(self.strides),
                padding=tuple(self.padding),
                use_bias=self.use_bias,
                dtype=self.dtype,
                name="conv",
            )(x)
        else:
            x = nn.Conv(
                self.features,
                kernel_size=tuple(self.kernel_size),
                strides=tuple(self.strides),
                padding=tuple(self.padding),
                use_bias=self.use_bias,
                dtype=self.dtype,
                name="conv",
            )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(x)
        if self.act is not None:
            x = self.act(x)
        return x


class ResidualBlockND(nn.Module):
    """Residual block: ConvBNReLU -> ConvBN (+ 1x1 ConvBN shortcut) -> ReLU.

    Covers both the 3D video block (visual_encoder.py:34-87) and the 2D
    audio block (audio_encoder.py:34-89); dimensionality follows the rank
    of ``kernel_size``.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    dtype: Dtype = jnp.float32
    lowering: str = "conv"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pad = [((k - 1) // 2, (k - 1) // 2) for k in self.kernel_size]
        needs_proj = (
            any(s != 1 for s in self.strides) or x.shape[-1] != self.features
        )
        if needs_proj:
            identity = ConvBNAct(
                self.features,
                kernel_size=[1] * len(self.kernel_size),
                strides=self.strides,
                padding=[(0, 0)] * len(self.kernel_size),
                act=None,
                dtype=self.dtype,
                lowering=self.lowering,
                name="downsample",
            )(x, train=train)
        else:
            identity = x
        out = ConvBNAct(
            self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=pad,
            dtype=self.dtype,
            lowering=self.lowering,
            name="conv1",
        )(x, train=train)
        out = ConvBNAct(
            self.features,
            kernel_size=self.kernel_size,
            strides=[1] * len(self.kernel_size),
            padding=pad,
            act=None,
            dtype=self.dtype,
            lowering=self.lowering,
            name="conv2",
        )(out, train=train)
        return nn.relu(out + identity)


def max_pool_same(
    x: jnp.ndarray,
    window: Sequence[int],
    strides: Sequence[int],
    padding: Sequence[Tuple[int, int]],
) -> jnp.ndarray:
    """Max pool over the spatial dims of a channels-last array.

    Pads with -inf like torch's MaxPool (visual stem maxpool
    visual_encoder.py:124-128; audio stem maxpool audio_encoder.py:139).
    ``window``/``strides``/``padding`` cover only spatial dims.
    """
    dims = (1,) + tuple(window) + (1,)
    strd = (1,) + tuple(strides) + (1,)
    pad = ((0, 0),) + tuple(padding) + ((0, 0),)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, dims, strd, pad
    ).astype(x.dtype)


class MultiHeadAttention(nn.Module):
    """Torch-compatible multi-head attention (``nn.MultiheadAttention``).

    Packed-QKV semantics of torch are reproduced with separate q/k/v
    projections; the checkpoint converter splits ``in_proj_weight``
    accordingly. Attention-weight dropout only applies in training.
    """

    dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        key: jnp.ndarray,
        value: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        d_head = self.dim // self.num_heads
        dense = lambda name: nn.Dense(self.dim, dtype=self.dtype, name=name)
        q = dense("q_proj")(query)
        k = dense("k_proj")(key)
        v = dense("v_proj")(value)

        def split(t):  # (B, T, D) -> (B, H, T, dh)
            b, t_len, _ = t.shape
            return t.reshape(b, t_len, self.num_heads, d_head).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        scale = 1.0 / jnp.sqrt(jnp.asarray(d_head, dtype=jnp.float32))
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        if self.dropout > 0.0 and not deterministic:
            weights = nn.Dropout(rate=self.dropout, deterministic=False)(weights)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        b, _, t_len, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, t_len, self.dim)
        return dense("out_proj")(out)


class TransformerEncoderLayer(nn.Module):
    """Pre-norm transformer encoder layer matching
    ``nn.TransformerEncoderLayer(norm_first=True, activation="gelu")``
    as used by the temporal transformer (temporal.py:64-72)."""

    dim: int
    num_heads: int
    ff_dim: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)
        h = ln("norm1")(x)
        h = MultiHeadAttention(
            self.dim, self.num_heads, dropout=self.dropout, dtype=self.dtype,
            name="self_attn",
        )(h, h, h, deterministic=deterministic)
        if self.dropout > 0.0 and not deterministic:
            h = nn.Dropout(rate=self.dropout, deterministic=False)(h)
        x = x + h
        h = ln("norm2")(x)
        h = nn.Dense(self.ff_dim, dtype=self.dtype, name="linear1")(h)
        h = gelu_exact(h)
        if self.dropout > 0.0 and not deterministic:
            h = nn.Dropout(rate=self.dropout, deterministic=False)(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="linear2")(h)
        if self.dropout > 0.0 and not deterministic:
            h = nn.Dropout(rate=self.dropout, deterministic=False)(h)
        return x + h


def interp_linear_time(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Linear interpolation along axis 1 of a (B, T, D) array.

    Matches ``F.interpolate(mode="linear", align_corners=False)``
    (fusion_module.py:67-73): half-pixel sample centers, edge clamp.
    """
    t_in = x.shape[1]
    if t_in == out_len:
        return x
    scale = t_in / out_len
    pos = (jnp.arange(out_len, dtype=jnp.float32) + 0.5) * scale - 0.5
    pos = jnp.clip(pos, 0.0, t_in - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t_in - 1)
    w = (pos - lo.astype(jnp.float32)).astype(x.dtype)[None, :, None]
    return x[:, lo, :] * (1.0 - w) + x[:, hi, :] * w
