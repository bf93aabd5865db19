"""First-stage autoencoders: KL-VAE, VQ-GAN, identity (NHWC flax).

Parity targets (all /root/reference):
  Encoder / Decoder / ResnetBlock / AttnBlock / Up/Downsample
      ldm/modules/diffusionmodules/model.py:33-568
      (note the VAE Downsample uses asymmetric (0,1,0,1) padding, model.py:60-79)
  AutoencoderKL   ldm/models/autoencoder.py:285-423
  VQModel / VQModelInterface   autoencoder.py:14-282
  IdentityFirstStage   autoencoder.py:426-443

TPU design: NHWC, fp32 GroupNorm(eps=1e-6) with fused swish, the single-head
spatial AttnBlock expressed through the shared sdpa kernel, nearest-neighbour
upsample as jnp.repeat (layout-friendly on VPU).
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.norms import silu
from .distributions import DiagonalGaussian
from .layers import GroupNorm32, _attend, conv1x1, conv3x3
from .quantize import VectorQuantizer

Dtype = jnp.dtype


class VaeResnetBlock(nn.Module):
    out_channels: Optional[int] = None
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        c = x.shape[-1]
        out_ch = self.out_channels or c
        h = GroupNorm32(eps=1e-6, name="norm1")(x, act=silu)
        h = conv3x3(out_ch, name="conv1", dtype=self.dtype)(h)
        h = GroupNorm32(eps=1e-6, name="norm2")(h, act=silu)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = conv3x3(out_ch, name="conv2", dtype=self.dtype)(h)
        if out_ch != c:
            x = conv1x1(out_ch, name="nin_shortcut", dtype=self.dtype)(x)
        return x + h


class VaeAttnBlock(nn.Module):
    """Single-head spatial self-attention with 1x1 q/k/v/out projections."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = GroupNorm32(eps=1e-6, name="norm")(x)
        q = conv1x1(c, name="q", dtype=self.dtype)(y).reshape(b, 1, h * w, c)
        k = conv1x1(c, name="k", dtype=self.dtype)(y).reshape(b, 1, h * w, c)
        v = conv1x1(c, name="v", dtype=self.dtype)(y).reshape(b, 1, h * w, c)
        out = _attend(q, k, v).reshape(b, h, w, c)
        return x + conv1x1(c, name="proj_out", dtype=self.dtype)(out)


class VaeLinAttnBlock(nn.Module):
    """Linear-attention block (`LinAttnBlock`, model.py:144-147, wrapping
    `LinearAttention`, ldm/modules/attention.py:80-96).

    Matches the reference exactly: fused bias-free 1x1 qkv projection,
    softmax over the *spatial* axis of k, two einsum contractions, biased
    1x1 output projection — and, faithfully to `LinAttnBlock`, NO residual
    add and NO pre-norm (unlike the vanilla AttnBlock).
    """

    heads: int = 1
    dim_head: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        d = self.dim_head or c
        hidden = self.heads * d
        qkv = nn.Conv(
            hidden * 3, (1, 1), use_bias=False, name="to_qkv", dtype=self.dtype
        )(x)
        # torch channel layout is (qkv, heads, d) major->minor; NHWC keeps the
        # same trailing-axis order, so a plain reshape reproduces the split.
        qkv = qkv.reshape(b, h * w, 3, self.heads, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # each [b, n, heads, d]
        k = jax.nn.softmax(k.astype(jnp.float32), axis=1).astype(v.dtype)
        context = jnp.einsum("bnhd,bnhe->bhde", k, v)
        out = jnp.einsum("bhde,bnhd->bnhe", context, q)
        out = out.reshape(b, h, w, hidden)
        return nn.Conv(c, (1, 1), name="to_out", dtype=self.dtype)(out)


def make_attn(attn_type: str, *, name: str, dtype: Dtype = jnp.float32):
    """`make_attn` (model.py:205-214): vanilla / linear / none dispatch.

    Returns a callable applied to the NHWC feature map ("none" is identity
    and materialises no params, matching the reference's nn.Identity).
    """
    if attn_type == "vanilla":
        return VaeAttnBlock(name=name, dtype=dtype)
    if attn_type == "linear":
        return VaeLinAttnBlock(name=name, dtype=dtype)
    if attn_type == "none":
        return lambda h: h
    raise ValueError(f"attn_type {attn_type!r} unknown")


class VaeDownsample(nn.Module):
    """stride-2 conv with the VAE's asymmetric (0,1) zero pad, or avg-pool."""

    with_conv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.with_conv:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            return nn.Conv(
                x.shape[-1], (3, 3), strides=(2, 2), padding="VALID",
                name="conv", dtype=self.dtype,
            )(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class VaeUpsample(nn.Module):
    with_conv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        if self.with_conv:
            x = conv3x3(x.shape[-1], name="conv", dtype=self.dtype)(x)
        return x


class Encoder(nn.Module):
    ch: int
    z_channels: int
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    resamp_with_conv: bool = True
    resolution: int = 256
    double_z: bool = True
    attn_type: str = "vanilla"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        num_res = len(self.ch_mult)
        curr_res = self.resolution
        h = conv3x3(self.ch, name="conv_in", dtype=self.dtype)(x.astype(self.dtype))
        for i_level in range(num_res):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks):
                h = VaeResnetBlock(
                    block_out, self.dropout, name=f"down_{i_level}_block_{i_block}",
                    dtype=self.dtype,
                )(h, deterministic=deterministic)
                if curr_res in self.attn_resolutions:
                    h = make_attn(
                        self.attn_type,
                        name=f"down_{i_level}_attn_{i_block}", dtype=self.dtype,
                    )(h)
            if i_level != num_res - 1:
                h = VaeDownsample(
                    self.resamp_with_conv, name=f"down_{i_level}_downsample", dtype=self.dtype
                )(h)
                curr_res //= 2

        h = VaeResnetBlock(dropout=self.dropout, name="mid_block_1", dtype=self.dtype)(
            h, deterministic=deterministic
        )
        h = make_attn(self.attn_type, name="mid_attn_1", dtype=self.dtype)(h)
        h = VaeResnetBlock(dropout=self.dropout, name="mid_block_2", dtype=self.dtype)(
            h, deterministic=deterministic
        )

        h = GroupNorm32(eps=1e-6, name="norm_out")(h, act=silu)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return conv3x3(out_ch, name="conv_out", dtype=self.dtype)(h)


class Decoder(nn.Module):
    ch: int
    out_ch: int
    z_channels: int
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    resamp_with_conv: bool = True
    resolution: int = 256
    give_pre_end: bool = False
    tanh_out: bool = False
    attn_type: str = "vanilla"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z, *, deterministic: bool = True):
        num_res = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[num_res - 1]
        curr_res = self.resolution // 2 ** (num_res - 1)

        h = conv3x3(block_in, name="conv_in", dtype=self.dtype)(z.astype(self.dtype))
        h = VaeResnetBlock(dropout=self.dropout, name="mid_block_1", dtype=self.dtype)(
            h, deterministic=deterministic
        )
        h = make_attn(self.attn_type, name="mid_attn_1", dtype=self.dtype)(h)
        h = VaeResnetBlock(dropout=self.dropout, name="mid_block_2", dtype=self.dtype)(
            h, deterministic=deterministic
        )

        for i_level in reversed(range(num_res)):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                h = VaeResnetBlock(
                    block_out, self.dropout, name=f"up_{i_level}_block_{i_block}",
                    dtype=self.dtype,
                )(h, deterministic=deterministic)
                if curr_res in self.attn_resolutions:
                    h = make_attn(
                        self.attn_type,
                        name=f"up_{i_level}_attn_{i_block}", dtype=self.dtype,
                    )(h)
            if i_level != 0:
                h = VaeUpsample(
                    self.resamp_with_conv, name=f"up_{i_level}_upsample", dtype=self.dtype
                )(h)
                curr_res *= 2

        if self.give_pre_end:
            return h
        h = GroupNorm32(eps=1e-6, name="norm_out")(h, act=silu)
        h = conv3x3(self.out_ch, name="conv_out", dtype=self.dtype)(h)
        if self.tanh_out:
            h = jnp.tanh(h)
        return h


def _ddkwargs(ddconfig: dict, decoder: bool = False) -> dict:
    keys = [
        "ch", "ch_mult", "num_res_blocks", "attn_resolutions", "dropout",
        "resolution",
    ]
    out = {k: ddconfig[k] for k in keys if k in ddconfig}
    if "attn_resolutions" in out:
        out["attn_resolutions"] = tuple(out["attn_resolutions"])
    # model.py:219-221: use_linear_attn forces attn_type="linear".
    attn_type = ddconfig.get("attn_type", "vanilla")
    if ddconfig.get("use_linear_attn", False):
        attn_type = "linear"
    out["attn_type"] = attn_type
    if "ch_mult" in out:
        out["ch_mult"] = tuple(out["ch_mult"])
    out["z_channels"] = ddconfig["z_channels"]
    if decoder:
        out["out_ch"] = ddconfig["out_ch"]
        out["give_pre_end"] = ddconfig.get("give_pre_end", False)
        out["tanh_out"] = ddconfig.get("tanh_out", False)
    else:
        out["double_z"] = ddconfig.get("double_z", True)
    return out


class AutoencoderKL(nn.Module):
    """KL-regularised VAE with 1x1 moment/quant convs on the latent."""

    ddconfig: dict
    embed_dim: int
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(**_ddkwargs(self.ddconfig), dtype=self.dtype)
        self.decoder = Decoder(**_ddkwargs(self.ddconfig, decoder=True), dtype=self.dtype)
        assert self.ddconfig.get("double_z", True)
        self.quant_conv = conv1x1(2 * self.embed_dim, name="quant_conv", dtype=self.dtype)
        self.post_quant_conv = conv1x1(
            self.ddconfig["z_channels"], name="post_quant_conv", dtype=self.dtype
        )

    def encode(self, x, *, deterministic: bool = True) -> DiagonalGaussian:
        h = self.encoder(x, deterministic=deterministic)
        moments = self.quant_conv(h)
        return DiagonalGaussian.from_moments(moments)

    def decode(self, z, *, deterministic: bool = True):
        return self.decoder(self.post_quant_conv(z), deterministic=deterministic)

    def __call__(self, x, rng=None, sample_posterior: bool = True, *, deterministic=True):
        posterior = self.encode(x, deterministic=deterministic)
        if sample_posterior:
            assert rng is not None
            z = posterior.sample(rng)
        else:
            z = posterior.mode()
        return self.decode(z, deterministic=deterministic), posterior


class VQModel(nn.Module):
    """VQ-GAN autoencoder: Encoder -> quant_conv -> VQ -> post_quant_conv -> Decoder."""

    ddconfig: dict
    n_embed: int
    embed_dim: int
    beta: float = 0.25
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(**_ddkwargs(self.ddconfig), dtype=self.dtype)
        self.decoder = Decoder(**_ddkwargs(self.ddconfig, decoder=True), dtype=self.dtype)
        self.quantize = VectorQuantizer(self.n_embed, self.embed_dim, self.beta)
        self.quant_conv = conv1x1(self.embed_dim, name="quant_conv", dtype=self.dtype)
        self.post_quant_conv = conv1x1(
            self.ddconfig["z_channels"], name="post_quant_conv", dtype=self.dtype
        )

    def encode(self, x, *, deterministic: bool = True):
        h = self.quant_conv(self.encoder(x, deterministic=deterministic))
        return self.quantize(h)

    def encode_prequant(self, x, *, deterministic: bool = True):
        """Un-quantized latent (the `VQModelInterface.encode` used by LDM)."""
        return self.quant_conv(self.encoder(x, deterministic=deterministic))

    def decode(self, quant, *, deterministic: bool = True):
        return self.decoder(self.post_quant_conv(quant), deterministic=deterministic)

    def decode_interface(self, h, force_not_quantize: bool = False, *, deterministic=True):
        """`VQModelInterface.decode`: optionally quantize the latent first."""
        if not force_not_quantize:
            quant, _, _ = self.quantize(h)
        else:
            quant = h
        return self.decode(quant, deterministic=deterministic)

    def decode_code(self, code, *, deterministic: bool = True):
        return self.decode(self.quantize.embed_code(code), deterministic=deterministic)

    def __call__(self, x, *, deterministic: bool = True):
        quant, diff, (_, _, indices) = self.encode(x, deterministic=deterministic)
        dec = self.decode(quant, deterministic=deterministic)
        return dec, diff, indices


class IdentityFirstStage(nn.Module):
    """Pixel-space passthrough (also covers STDiff's IdentityAutoEncoder)."""

    vq_interface: bool = False

    def encode(self, x, **_):
        return x

    def decode(self, x, **_):
        return x

    def quantize_fn(self, x):
        if self.vq_interface:
            return x, None, (None, None, None)
        return x

    def __call__(self, x, **_):
        return x
