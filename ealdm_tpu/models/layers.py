"""Shared flax.linen building blocks for the UNet denoiser (NHWC).

Parity map (all against /root/reference):
  ResBlock            ldm/modules/diffusionmodules/openaimodel.py:163-275
  Upsample/Downsample openaimodel.py:91-160
  CrossAttention      ldm/modules/attention.py:152-193
  BasicTransformerBlock attention.py:196-215
  SpatialTransformer  attention.py:218-261
  GEGLU / FeedForward attention.py:37-63
  AttentionBlock (QKV self-attn) openaimodel.py:278-341 + QKVAttentionLegacy

Design: channel-last (NHWC) tensors, fp32 GroupNorm statistics, attention via
the fused sdpa/flash kernels in ops.attention, zero-initialised output
projections exactly where the reference zero-inits (`zero_module`).
Gradient checkpointing is applied at the UNet level with jax.checkpoint
instead of per-module torch checkpoint wrappers.
"""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import (
    attention_impl,
    flash_attention,
    flash_attention_packed,
    sdpa,
    tiny_ctx_attention_packed,
)
from ..ops.norms import group_norm, silu

Dtype = jnp.dtype

# Token count at/above which the fused Pallas kernel is used when the
# global attention impl is "flash" (set_attention_impl; inference-only).
FLASH_MIN_TOKENS = 256


class Conv2D(nn.Module):
    """2-D convolution over NHWC or HWNC input.

    Parameter tree ("kernel" [kh, kw, cin, cout] HWIO + "bias" [cout]) is
    identical to flax nn.Conv, so checkpoints and the torch key maps are
    layout-independent. HWNC is the TPU-native form: XLA's conv layout
    assignment puts (N, C) on the (sublane, lane) tile either way, but a
    logically-HWNC graph never needs relayout copies at kernel/reshape
    boundaries (see ops/group_norm_pallas.py).
    """

    features: int
    kernel_size: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: object = "SAME"
    zero_init: bool = False
    data_format: str = "NHWC"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kh, kw = self.kernel_size
        init = nn.initializers.zeros if self.zero_init else (
            nn.initializers.lecun_normal()
        )
        kernel = self.param("kernel", init, (kh, kw, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        from ..ops.winograd import conv2d as conv_dispatch

        y = conv_dispatch(
            x, kernel, strides=self.strides, padding=self.padding,
            data_format=self.data_format, dtype=self.dtype,
        )
        return y + bias.astype(self.dtype)


def conv3x3(features, name=None, dtype=jnp.float32, zero_init=False,
            data_format="NHWC"):
    return Conv2D(features, (3, 3), padding=1, name=name, dtype=dtype,
                  zero_init=zero_init, data_format=data_format)


def conv1x1(features, name=None, dtype=jnp.float32, zero_init=False,
            data_format="NHWC"):
    return Conv2D(features, (1, 1), name=name, dtype=dtype,
                  zero_init=zero_init, data_format=data_format)


class LayerNorm(nn.Module):
    """LayerNorm via ops.norms.layer_norm (precision-switchable stats)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        from ..ops.norms import layer_norm

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return layer_norm(x, scale, bias, eps=self.eps)


class GroupNorm32(nn.Module):
    """GroupNorm with fp32 statistics (reference `GroupNorm32`)."""

    num_groups: int = 32
    eps: float = 1e-5
    data_format: str = "NHWC"

    @nn.compact
    def __call__(self, x, act: Optional[Callable] = None, pre_bias=None):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return group_norm(
            x, scale, bias, num_groups=self.num_groups, eps=self.eps, act=act,
            data_format=self.data_format, pre_bias=pre_bias,
        )


class Upsample(nn.Module):
    """2x nearest-neighbour upsample + optional 3x3 conv."""

    out_channels: Optional[int] = None
    use_conv: bool = True
    dtype: Dtype = jnp.float32
    data_format: str = "NHWC"

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        ax = (1, 2) if self.data_format == "NHWC" else (0, 1)
        x = jnp.repeat(jnp.repeat(x, 2, axis=ax[0]), 2, axis=ax[1])
        if self.use_conv:
            x = conv3x3(self.out_channels or c, name="conv", dtype=self.dtype,
                        data_format=self.data_format)(x)
        return x


class TransposedUpsample(nn.Module):
    """Learned 2x upsample via stride-2 transposed conv, no padding
    (reference `openaimodel.py:121-131`; unused by the shipped configs but
    part of the UNet op surface). NHWC only."""

    out_channels: Optional[int] = None
    ks: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(
            self.out_channels or x.shape[-1], (self.ks, self.ks),
            strides=(2, 2), padding="VALID", name="up", dtype=self.dtype,
        )(x)


class Downsample(nn.Module):
    """stride-2 3x3 conv (symmetric pad=1, UNet flavour) or 2x2 avg-pool."""

    out_channels: Optional[int] = None
    use_conv: bool = True
    dtype: Dtype = jnp.float32
    data_format: str = "NHWC"

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        if self.use_conv:
            return Conv2D(
                self.out_channels or c, (3, 3), strides=(2, 2), padding=1,
                name="op", dtype=self.dtype, data_format=self.data_format,
            )(x)
        assert self.out_channels in (None, c)
        ax = (1, 2) if self.data_format == "NHWC" else (0, 1)
        window = [1, 1, 1, 1]
        window[ax[0]] = window[ax[1]] = 2
        summed = jax.lax.reduce_window(
            x, jnp.zeros((), x.dtype), jax.lax.add,
            tuple(window), tuple(window), "VALID",
        )
        return summed / jnp.asarray(4, x.dtype)


class ResBlock(nn.Module):
    """GroupNorm-SiLU-conv residual block with timestep-embedding injection."""

    out_channels: Optional[int] = None
    dropout: float = 0.0
    use_scale_shift_norm: bool = False
    use_conv_skip: bool = False  # 3x3 instead of 1x1 on channel-changing skip
    up: bool = False
    down: bool = False
    dtype: Dtype = jnp.float32
    data_format: str = "NHWC"

    @nn.compact
    def __call__(self, x, emb, *, emb_out=None, deterministic: bool = True):
        """emb_out: optional precomputed `emb_proj(silu(emb))` row — the
        timestep embedding is step-uniform across the batch, so samplers can
        hoist this projection out of the scan (one [S, (2*)out_ch] table for
        all S steps); see unet.precompute_emb_tables."""
        c = x.shape[-1]
        fmt = self.data_format
        out_ch = self.out_channels or c

        h = GroupNorm32(name="in_norm", data_format=fmt)(x, act=silu)
        if self.up or self.down:
            resample = (
                Upsample(use_conv=False, data_format=fmt)
                if self.up else Downsample(use_conv=False, data_format=fmt)
            )
            h = resample(h)
            x = resample(x)
        h = conv3x3(out_ch, name="in_conv", dtype=self.dtype, data_format=fmt)(h)

        if emb_out is None:
            emb_out = nn.Dense(
                2 * out_ch if self.use_scale_shift_norm else out_ch,
                name="emb_proj",
                dtype=self.dtype,
            )(silu(emb))  # [N, (2*)out_ch]
        elif emb_out.ndim == 1:
            # precomputed per-step row (see unet.precompute_emb_tables):
            # identical for every batch element, broadcast as [1, (2*)out_ch]
            emb_out = emb_out[None, :]

        if self.use_scale_shift_norm:
            ss = (
                emb_out[:, None, None, :] if fmt == "NHWC" else emb_out
            )
            scale, shift = jnp.split(ss, 2, axis=-1)
            h = GroupNorm32(name="out_norm", data_format=fmt)(h) * (1 + scale) + shift
            h = silu(h)
        else:
            # the embedding add is fused into the norm's statistics pass
            h = GroupNorm32(name="out_norm", data_format=fmt)(
                h, act=silu, pre_bias=emb_out.astype(h.dtype)
            )
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = conv3x3(out_ch, name="out_conv", dtype=self.dtype, zero_init=True,
                    data_format=fmt)(h)

        if out_ch == c:
            skip = x
        elif self.use_conv_skip:
            skip = conv3x3(out_ch, name="skip", dtype=self.dtype, data_format=fmt)(x)
        else:
            skip = conv1x1(out_ch, name="skip", dtype=self.dtype, data_format=fmt)(x)
        return skip + h


def _attend(q, k, v):
    """[B, H, N, D] attention. The fused Pallas kernel (grad-safe via a
    rematerialized dense backward) is used when the global impl is "flash",
    on TPU, for block-aligned self-attention-sized sequences."""
    n = q.shape[2]
    if (
        attention_impl() in ("flash", "flash_packed")
        and n >= FLASH_MIN_TOKENS
        and n == k.shape[2]
        and jax.default_backend() == "tpu"
        and n % 256 == 0
    ):
        return flash_attention(q, k, v)
    return sdpa(q, k, v)


def _flash_packed_eligible(n, m):
    """Packed-layout flash (head split/merge via kernel indexing, no HBM
    re-layout — round-5 formatting experiment) applies at the same sites
    the split-layout flash does."""
    return (
        attention_impl() == "flash_packed"
        and n >= FLASH_MIN_TOKENS
        and n == m
        and jax.default_backend() == "tpu"
        and n % 256 == 0
    )


class CrossAttention(nn.Module):
    """Multi-head attention; self-attention when context is None."""

    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, *, kv=None, deterministic: bool = True):
        """kv: optional precomputed (k, v) [B, M, inner] projections of a
        step-constant context — samplers hoist `to_k(ctx)`/`to_v(ctx)` out of
        the diffusion scan (see unet.precompute_context_kv); skips to_k/to_v
        here with bit-identical results."""
        b, n, c = x.shape
        inner = self.heads * self.dim_head

        # Separate projections: measured faster than manual qkv fusion on
        # v5e — XLA already batches matmuls sharing an operand, and the
        # explicit concatenate only added copies.
        q = nn.Dense(inner, use_bias=False, name="to_q", dtype=self.dtype)(x)
        if kv is not None:
            k, v = kv
            m = k.shape[1]
        else:
            context = x if context is None else context
            m = context.shape[1]
            k = nn.Dense(inner, use_bias=False, name="to_k", dtype=self.dtype)(context)
            v = nn.Dense(inner, use_bias=False, name="to_v", dtype=self.dtype)(context)

        if _flash_packed_eligible(n, m):
            # q/k/v stay in the Dense-native [B, N, H*D]; the kernel slices
            # heads in VMEM — no split/merge HBM transposes (round 5).
            out = flash_attention_packed(q, k, v, self.heads)
        elif (attention_impl() == "flash_packed"
              and m * self.heads <= 128 and n >= FLASH_MIN_TOKENS):
            # tiny-context cross-attention: block-diagonal matmuls consume q
            # in its native layout (no seq-minor re-layout inside the scan)
            out = tiny_ctx_attention_packed(q, k, v, self.heads)
        else:
            def split(t, length):
                return t.reshape(
                    b, length, self.heads, self.dim_head
                ).transpose(0, 2, 1, 3)

            out = _attend(split(q, n), split(k, m), split(v, m))
            out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = nn.Dense(c, name="to_out", dtype=self.dtype)(out)
        return nn.Dropout(self.dropout, deterministic=deterministic)(out)


class GEGLU(nn.Module):
    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim_out * 2, name="proj", dtype=self.dtype)(x)
        x, gate = jnp.split(x, 2, axis=-1)
        return x * nn.gelu(gate)


class FeedForward(nn.Module):
    mult: int = 4
    glu: bool = True
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        c = x.shape[-1]
        inner = int(c * self.mult)
        if self.glu:
            h = GEGLU(inner, name="geglu", dtype=self.dtype)(x)
        else:
            h = nn.gelu(nn.Dense(inner, name="in_proj", dtype=self.dtype)(x))
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.Dense(c, name="out_proj", dtype=self.dtype)(h)


class BasicTransformerBlock(nn.Module):
    heads: int
    dim_head: int
    dropout: float = 0.0
    gated_ff: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, *, kv=None, deterministic: bool = True):
        x = (
            CrossAttention(
                self.heads, self.dim_head, self.dropout, name="attn1", dtype=self.dtype
            )(LayerNorm(name="norm1")(x), deterministic=deterministic)
            + x
        )
        x = (
            CrossAttention(
                self.heads, self.dim_head, self.dropout, name="attn2", dtype=self.dtype
            )(
                LayerNorm(name="norm2")(x),
                context=context,
                kv=kv,
                deterministic=deterministic,
            )
            + x
        )
        x = (
            FeedForward(glu=self.gated_ff, dropout=self.dropout, name="ff", dtype=self.dtype)(
                LayerNorm(name="norm3")(x), deterministic=deterministic
            )
            + x
        )
        return x


class SpatialTransformer(nn.Module):
    """Project spatial features to tokens, run transformer blocks, project
    back. NHWC or HWNC input (tokens are [N, H*W, C] either way)."""

    heads: int
    dim_head: int
    depth: int = 1
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    data_format: str = "NHWC"

    @nn.compact
    def __call__(self, x, context=None, *, kv=None, deterministic: bool = True):
        """kv: optional tuple of per-depth precomputed (k, v) cross-attn
        projections of a step-constant context (unet.precompute_context_kv)."""
        fmt = self.data_format
        if fmt == "NHWC":
            b, h, w, c = x.shape
        else:
            h, w, b, c = x.shape
        inner = self.heads * self.dim_head
        x_in = x
        x = GroupNorm32(eps=1e-6, name="norm", data_format=fmt)(x)
        x = conv1x1(inner, name="proj_in", dtype=self.dtype, data_format=fmt)(x)
        if fmt == "NHWC":
            x = x.reshape(b, h * w, inner)
        else:
            x = x.reshape(h * w, b, inner).transpose(1, 0, 2)
        for i in range(self.depth):
            x = BasicTransformerBlock(
                self.heads,
                self.dim_head,
                self.dropout,
                name=f"block_{i}",
                dtype=self.dtype,
            )(x, context=context, kv=None if kv is None else kv[i],
              deterministic=deterministic)
        if fmt == "NHWC":
            x = x.reshape(b, h, w, inner)
        else:
            x = x.transpose(1, 0, 2).reshape(h, w, b, inner)
        x = conv1x1(c, name="proj_out", dtype=self.dtype, zero_init=True,
                    data_format=fmt)(x)
        return x + x_in


class AttentionBlock(nn.Module):
    """QKV self-attention over flattened spatial (ADM AttentionBlock)."""

    num_heads: int = 1
    dtype: Dtype = jnp.float32
    data_format: str = "NHWC"

    @nn.compact
    def __call__(self, x):
        fmt = self.data_format
        if fmt == "NHWC":
            b, h, w, c = x.shape
        else:
            h, w, b, c = x.shape
        assert c % self.num_heads == 0
        head_dim = c // self.num_heads
        n = h * w
        y = GroupNorm32(name="norm", data_format=fmt)(x)
        if fmt == "NHWC":
            y = y.reshape(b, n, c)
        else:
            y = y.reshape(n, b, c).transpose(1, 0, 2)
        qkv = nn.Dense(3 * c, name="qkv", dtype=self.dtype)(y)
        # legacy layout: heads split before qkv split: [B, N, H, 3*hd]
        qkv = qkv.reshape(b, n, self.num_heads, 3 * head_dim)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        out = _attend(q, k, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        out = nn.Dense(
            c,
            name="proj_out",
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
        )(out)
        if fmt == "NHWC":
            return x + out.reshape(b, h, w, c)
        return x + out.transpose(1, 0, 2).reshape(h, w, b, c)
