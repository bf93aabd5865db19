"""Auxiliary VAE-family modules (NHWC flax).

Parity targets (`/root/reference/ldm/modules/diffusionmodules/model.py`):
  SimpleDecoder (571-602), UpsampleDecoder (605-651), LatentRescaler
  (654-689), MergedRescaleEncoder/Decoder (692-739), Upsampler (742-761),
  Resize (764-790), FirstStagePostProcessor (793-835); plus the
  LinearAttention / SpatialSelfAttention variants of
  `ldm/modules/attention.py:79-150`.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.norms import silu
from .layers import GroupNorm32, conv1x1, conv3x3
from .vae import Encoder, VaeAttnBlock, VaeResnetBlock, VaeUpsample, _ddkwargs


class LinearAttention(nn.Module):
    """Linear (kernelized) attention over NHWC maps (attention.py:79-96)."""

    heads: int = 4
    dim_head: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hidden = self.heads * self.dim_head
        qkv = nn.Conv(hidden * 3, (1, 1), use_bias=False, name="to_qkv",
                      dtype=self.dtype)(x)
        qkv = qkv.reshape(b, h * w, 3, self.heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [b, n, heads, d]
        k = jax.nn.softmax(k, axis=1)
        context = jnp.einsum("bnhd,bnhe->bhde", k, v)
        out = jnp.einsum("bhde,bnhd->bnhe", context, q)
        out = out.reshape(b, h, w, hidden)
        return nn.Conv(c, (1, 1), name="to_out", dtype=self.dtype)(out)


class SpatialSelfAttention(nn.Module):
    """Vanilla single-head spatial self-attention (attention.py:99-150)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return VaeAttnBlock(name="attn", dtype=self.dtype)(x)


class SimpleDecoder(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic=True):
        c = x.shape[-1]
        x = conv1x1(c, name="conv_in", dtype=self.dtype)(x)
        x = VaeResnetBlock(2 * c, name="res1", dtype=self.dtype)(x, deterministic=deterministic)
        x = VaeResnetBlock(4 * c, name="res2", dtype=self.dtype)(x, deterministic=deterministic)
        x = VaeResnetBlock(2 * c, name="res3", dtype=self.dtype)(x, deterministic=deterministic)
        x = conv1x1(c, name="conv_mid", dtype=self.dtype)(x)
        x = VaeUpsample(with_conv=True, name="upsample", dtype=self.dtype)(x)
        x = GroupNorm32(eps=1e-6, name="norm_out")(x, act=silu)
        return conv3x3(self.out_channels, name="conv_out", dtype=self.dtype)(x)


class UpsampleDecoder(nn.Module):
    out_channels: int
    ch: int
    num_res_blocks: int
    ch_mult: Sequence[int] = (2, 2)
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic=True):
        h = x
        for i_level in range(len(self.ch_mult)):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                h = VaeResnetBlock(
                    block_out, self.dropout, name=f"res_{i_level}_{i_block}",
                    dtype=self.dtype,
                )(h, deterministic=deterministic)
            if i_level != len(self.ch_mult) - 1:
                h = VaeUpsample(with_conv=True, name=f"up_{i_level}", dtype=self.dtype)(h)
        h = GroupNorm32(eps=1e-6, name="norm_out")(h, act=silu)
        return conv3x3(self.out_channels, name="conv_out", dtype=self.dtype)(h)


class LatentRescaler(nn.Module):
    factor: float
    mid_channels: int
    out_channels: int
    depth: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic=True):
        x = conv3x3(self.mid_channels, name="conv_in", dtype=self.dtype)(x)
        for i in range(self.depth):
            x = VaeResnetBlock(name=f"res1_{i}", dtype=self.dtype)(
                x, deterministic=deterministic
            )
        n, h, w, c = x.shape
        x = jax.image.resize(
            x,
            (n, int(round(h * self.factor)), int(round(w * self.factor)), c),
            method="nearest",
        )
        x = VaeAttnBlock(name="attn", dtype=self.dtype)(x)
        for i in range(self.depth):
            x = VaeResnetBlock(name=f"res2_{i}", dtype=self.dtype)(
                x, deterministic=deterministic
            )
        return conv1x1(self.out_channels, name="conv_out", dtype=self.dtype)(x)


class MergedRescaleEncoder(nn.Module):
    ch: int
    out_ch: int
    resolution: int
    num_res_blocks: int
    attn_resolutions: Sequence[int]
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    rescale_factor: float = 1.0
    rescale_module_depth: int = 1
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic=True):
        intermediate = self.ch * self.ch_mult[-1]
        h = Encoder(
            ch=self.ch, z_channels=intermediate, ch_mult=tuple(self.ch_mult),
            num_res_blocks=self.num_res_blocks,
            attn_resolutions=tuple(self.attn_resolutions),
            resolution=self.resolution, double_z=False, dropout=self.dropout,
            name="encoder", dtype=self.dtype,
        )(x, deterministic=deterministic)
        return LatentRescaler(
            self.rescale_factor, intermediate, self.out_ch,
            self.rescale_module_depth, name="rescaler", dtype=self.dtype,
        )(h, deterministic=deterministic)


class MergedRescaleDecoder(nn.Module):
    """LatentRescaler -> Decoder (model.py:711-725): the rescaler widens
    z_channels to z_channels*ch_mult[-1], which the decoder consumes."""

    z_channels: int
    out_ch: int
    resolution: int
    num_res_blocks: int
    attn_resolutions: Sequence[int]
    ch: int
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    rescale_factor: float = 1.0
    rescale_module_depth: int = 1
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic=True):
        from .vae import Decoder

        tmp_chn = self.z_channels * self.ch_mult[-1]
        h = LatentRescaler(
            self.rescale_factor, tmp_chn, tmp_chn,
            self.rescale_module_depth, name="rescaler", dtype=self.dtype,
        )(x, deterministic=deterministic)
        return Decoder(
            ch=self.ch, out_ch=self.out_ch, z_channels=tmp_chn,
            ch_mult=tuple(self.ch_mult), num_res_blocks=self.num_res_blocks,
            attn_resolutions=tuple(self.attn_resolutions),
            dropout=self.dropout, resolution=self.resolution,
            name="decoder", dtype=self.dtype,
        )(h, deterministic=deterministic)


class Upsampler(nn.Module):
    """LatentRescaler -> Decoder ladder (model.py:728-761): log2(out/in)+1
    decoder levels of uniform ch_mult upsample to out_size."""

    in_size: int
    out_size: int
    in_channels: int
    out_channels: int
    ch_mult: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic=True):
        import math

        from .vae import Decoder

        assert self.out_size >= self.in_size
        num_blocks = int(math.log2(self.out_size // self.in_size)) + 1
        factor_up = 1.0 + (self.out_size % self.in_size)
        x = LatentRescaler(
            factor_up, 2 * self.in_channels, self.in_channels,
            name="rescaler", dtype=self.dtype,
        )(x, deterministic=deterministic)
        return Decoder(
            ch=self.in_channels, out_ch=self.out_channels,
            z_channels=self.in_channels,
            ch_mult=tuple(self.ch_mult for _ in range(num_blocks)),
            num_res_blocks=2, attn_resolutions=(),
            resolution=self.out_size, name="decoder", dtype=self.dtype,
        )(x, deterministic=deterministic)


class Resize(nn.Module):
    scale_factor: float = 1.0
    mode: str = "bilinear"

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        return jax.image.resize(
            x,
            (n, int(h * self.scale_factor), int(w * self.scale_factor), c),
            method="bilinear" if self.mode != "nearest" else "nearest",
        )


class FirstStagePostProcessor(nn.Module):
    """Project frozen first-stage latents through a small conv stack
    (model.py:793-835): proj_norm -> proj conv -> ResnetBlock/Downsample chain."""

    ch_mult: Sequence[int] = (1, 2)
    in_channels: int = 3
    proj_channels: Optional[int] = None
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, *, deterministic=True):
        c = self.proj_channels or z.shape[-1]
        h = GroupNorm32(eps=1e-6, name="proj_norm")(z)
        h = conv3x3(c, name="proj", dtype=self.dtype)(h)
        h = silu(h)
        for i, mult in enumerate(self.ch_mult):
            h = VaeResnetBlock(c * mult, self.dropout, name=f"res_{i}", dtype=self.dtype)(
                h, deterministic=deterministic
            )
            from .vae import VaeDownsample

            h = VaeDownsample(with_conv=False, name=f"down_{i}")(h)
        return h
