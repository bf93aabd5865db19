"""CLIP (text transformer + ViT visual trunk), flax/NHWC, OpenAI-faithful.

Value-parity target: the frozen CLIP used by the reference's
FrozenCLIPTextEmbedder / FrozenClipImageEmbedder
(`/root/reference/ldm/modules/encoders/modules.py:138-202`, `clip.load(...)`)
and the third-stage CLIP scorer (`STDiff/third_stage_model.py`).

Faithful architecture details (so an OpenAI `state_dict()` import is exact):
  * pre-LN residual blocks with packed-qkv MultiheadAttention
    (`attn.in_proj_weight` / `attn.out_proj`), QuickGELU MLP (c_fc/c_proj)
  * text: token_embedding + learned positional_embedding, CAUSAL mask,
    ln_final, pooling at each sequence's argmax token id (the EOT token),
    then `text_projection`
  * visual (ViT): patchify conv (no bias), class embedding prepended,
    positional embedding, ln_pre, transformer, ln_post on the class token,
    then `proj`

`load_torch_clip_state` maps OpenAI-CLIP state_dict naming; oracle-tested
against a hand-built torch twin in tests/test_eval_trunks.py.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    """torch.nn.MultiheadAttention with packed in_proj, as CLIP uses it."""

    width: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        d = self.width
        in_w = self.param(
            "in_proj_weight", nn.initializers.lecun_normal(), (3 * d, d))
        in_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,))
        qkv = x @ in_w.astype(self.dtype).T + in_b.astype(self.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, n, _ = q.shape
        hd = d // self.heads

        def heads_first(t):
            return t.reshape(b, n, self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = map(heads_first, (q, k, v))
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(hd)
        if mask is not None:
            logits = logits + mask
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
            self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
        out_w = self.param(
            "out_proj_weight", nn.initializers.lecun_normal(), (d, d))
        out_b = self.param("out_proj_bias", nn.initializers.zeros, (d,))
        return out @ out_w.astype(self.dtype).T + out_b.astype(self.dtype)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        x = x + CLIPAttention(self.width, self.heads, name="attn",
                              dtype=self.dtype)(h, mask)
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(4 * self.width, name="mlp_c_fc", dtype=self.dtype)(h)
        h = quick_gelu(h)
        h = nn.Dense(self.width, name="mlp_c_proj", dtype=self.dtype)(h)
        return x + h


class CLIPTransformer(nn.Module):
    width: int
    layers: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                self.width, self.heads, name=f"resblocks_{i}",
                dtype=self.dtype)(x, mask)
        return x


class CLIPTextTower(nn.Module):
    """Token ids [B, L] -> [B, embed_dim] (unnormalized) CLIP text features."""

    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    layers: int = 12
    heads: int = 8
    embed_dim: int = 512
    # Pooling position: None -> argmax(token id) (OpenAI convention, where
    # EOT=49407 is the vocab max). An explicit id pools at its FIRST
    # occurrence — identical for real CLIP ids, and required for hermetic
    # tokenizers whose EOS is not the vocab max.
    eot_id: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        x = nn.Embed(self.vocab_size, self.width, name="token_embedding",
                     dtype=self.dtype)(tokens)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01), (self.context_length, self.width))
        x = x + pos[: x.shape[1]].astype(self.dtype)
        n = x.shape[1]
        mask = jnp.triu(jnp.full((n, n), -jnp.inf, jnp.float32), k=1)
        x = CLIPTransformer(self.width, self.layers, self.heads,
                            name="transformer", dtype=self.dtype)(x, mask)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        if self.eot_id is None:
            # EOT token = largest id in each sequence (OpenAI convention)
            eot = jnp.argmax(tokens, axis=-1)
        else:
            # First occurrence of the explicit id; sequences where it never
            # occurs (e.g. real CLIP-BPE ids fed to a tower configured for a
            # hermetic tokenizer) fall back to the OpenAI argmax convention
            # instead of silently pooling at position 0 (SOT).
            is_eot = tokens == self.eot_id
            eot = jnp.where(
                jnp.any(is_eot, axis=-1),
                jnp.argmax(is_eot.astype(jnp.int32), axis=-1),
                jnp.argmax(tokens, axis=-1),
            )
        x = x[jnp.arange(x.shape[0]), eot]
        proj = self.param(
            "text_projection",
            nn.initializers.normal(self.width ** -0.5),
            (self.width, self.embed_dim))
        return x @ proj.astype(self.dtype)


class CLIPVisionTower(nn.Module):
    """NHWC image (CLIP-preprocessed) -> [B, embed_dim] visual features."""

    image_size: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    embed_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        x = nn.Conv(self.width, (p, p), strides=(p, p), padding="VALID",
                    use_bias=False, name="conv1", dtype=self.dtype)(x)
        b, gh, gw, c = x.shape
        x = x.reshape(b, gh * gw, c)
        cls = self.param("class_embedding",
                         nn.initializers.normal(0.01), (self.width,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, c)), x], axis=1)
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (gh * gw + 1, self.width))
        x = x + pos.astype(self.dtype)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(x)
        x = CLIPTransformer(self.width, self.layers, self.heads,
                            name="transformer", dtype=self.dtype)(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_post")(x[:, 0])
        proj = self.param(
            "proj", nn.initializers.normal(self.width ** -0.5),
            (self.width, self.embed_dim))
        return x @ proj.astype(self.dtype)


# CLIP preprocessing channel statistics (clip/clip.py _transform)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def clip_preprocess(x, image_size: int = 224):
    """[-1,1] NHWC -> CLIP-normalized NHWC at image_size^2 (bilinear)."""
    n, h, w, c = x.shape
    x = (x + 1.0) / 2.0
    if (h, w) != (image_size, image_size):
        x = jax.image.resize(x, (n, image_size, image_size, c), "bilinear")
    return (x - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)


# ------------------------------------------------------------------ import
def _block_params(sd, prefix, to_np):
    out = {
        "attn": {
            "in_proj_weight": to_np(sd[f"{prefix}.attn.in_proj_weight"]),
            "in_proj_bias": to_np(sd[f"{prefix}.attn.in_proj_bias"]),
            "out_proj_weight": to_np(sd[f"{prefix}.attn.out_proj.weight"]),
            "out_proj_bias": to_np(sd[f"{prefix}.attn.out_proj.bias"]),
        },
        "ln_1": {"scale": to_np(sd[f"{prefix}.ln_1.weight"]),
                 "bias": to_np(sd[f"{prefix}.ln_1.bias"])},
        "ln_2": {"scale": to_np(sd[f"{prefix}.ln_2.weight"]),
                 "bias": to_np(sd[f"{prefix}.ln_2.bias"])},
        "mlp_c_fc": {
            "kernel": to_np(sd[f"{prefix}.mlp.c_fc.weight"]).T,
            "bias": to_np(sd[f"{prefix}.mlp.c_fc.bias"])},
        "mlp_c_proj": {
            "kernel": to_np(sd[f"{prefix}.mlp.c_proj.weight"]).T,
            "bias": to_np(sd[f"{prefix}.mlp.c_proj.bias"])},
    }
    return out


def load_torch_clip_state(state_dict: Dict[str, Any]):
    """OpenAI CLIP `state_dict()` -> (text_params, visual_params) flax trees.

    Either half may be absent (e.g. a text-only checkpoint); the missing
    tree is returned as None. Visual import supports the ViT trunk.
    """
    from ..utils.torch_import import to_numpy

    def to_np(v):
        return jnp.asarray(to_numpy(v), jnp.float32)

    sd = state_dict
    text = visual = None

    if "token_embedding.weight" in sd:
        layers = len({k.split(".")[2] for k in sd
                      if k.startswith("transformer.resblocks.")})
        tr = {f"resblocks_{i}": _block_params(
            sd, f"transformer.resblocks.{i}", to_np) for i in range(layers)}
        text = {
            "token_embedding": {
                "embedding": to_np(sd["token_embedding.weight"])},
            "positional_embedding": to_np(sd["positional_embedding"]),
            "transformer": tr,
            "ln_final": {"scale": to_np(sd["ln_final.weight"]),
                         "bias": to_np(sd["ln_final.bias"])},
            "text_projection": to_np(sd["text_projection"]),
        }

    if "text_model.embeddings.token_embedding.weight" in sd:
        text = _hf_text_params(sd, to_np)
    if "vision_model.embeddings.patch_embedding.weight" in sd:
        visual = _hf_vision_params(sd, to_np)

    if "visual.conv1.weight" in sd:
        layers = len({k.split(".")[3] for k in sd
                      if k.startswith("visual.transformer.resblocks.")})
        tr = {f"resblocks_{i}": _block_params(
            sd, f"visual.transformer.resblocks.{i}", to_np)
            for i in range(layers)}
        visual = {
            "conv1": {"kernel": np.transpose(
                np.asarray(to_np(sd["visual.conv1.weight"])), (2, 3, 1, 0))},
            "class_embedding": to_np(sd["visual.class_embedding"]),
            "positional_embedding": to_np(sd["visual.positional_embedding"]),
            "ln_pre": {"scale": to_np(sd["visual.ln_pre.weight"]),
                       "bias": to_np(sd["visual.ln_pre.bias"])},
            "transformer": tr,
            "ln_post": {"scale": to_np(sd["visual.ln_post.weight"]),
                        "bias": to_np(sd["visual.ln_post.bias"])},
            "proj": to_np(sd["visual.proj"]),
        }
    return text, visual


def _hf_block_params(sd, prefix, to_np):
    """HF CLIPEncoderLayer -> ResidualAttentionBlock params (q/k/v packed)."""
    qw = to_np(sd[f"{prefix}.self_attn.q_proj.weight"])
    kw = to_np(sd[f"{prefix}.self_attn.k_proj.weight"])
    vw = to_np(sd[f"{prefix}.self_attn.v_proj.weight"])
    qb = to_np(sd[f"{prefix}.self_attn.q_proj.bias"])
    kb = to_np(sd[f"{prefix}.self_attn.k_proj.bias"])
    vb = to_np(sd[f"{prefix}.self_attn.v_proj.bias"])
    return {
        "attn": {
            "in_proj_weight": jnp.concatenate([qw, kw, vw], axis=0),
            "in_proj_bias": jnp.concatenate([qb, kb, vb], axis=0),
            "out_proj_weight": to_np(sd[f"{prefix}.self_attn.out_proj.weight"]),
            "out_proj_bias": to_np(sd[f"{prefix}.self_attn.out_proj.bias"]),
        },
        "ln_1": {"scale": to_np(sd[f"{prefix}.layer_norm1.weight"]),
                 "bias": to_np(sd[f"{prefix}.layer_norm1.bias"])},
        "ln_2": {"scale": to_np(sd[f"{prefix}.layer_norm2.weight"]),
                 "bias": to_np(sd[f"{prefix}.layer_norm2.bias"])},
        "mlp_c_fc": {"kernel": to_np(sd[f"{prefix}.mlp.fc1.weight"]).T,
                     "bias": to_np(sd[f"{prefix}.mlp.fc1.bias"])},
        "mlp_c_proj": {"kernel": to_np(sd[f"{prefix}.mlp.fc2.weight"]).T,
                       "bias": to_np(sd[f"{prefix}.mlp.fc2.bias"])},
    }


def _hf_text_params(sd, to_np):
    base = "text_model"
    layers = len({k.split(".")[3] for k in sd
                  if k.startswith(f"{base}.encoder.layers.")})
    tr = {f"resblocks_{i}": _hf_block_params(
        sd, f"{base}.encoder.layers.{i}", to_np) for i in range(layers)}
    return {
        "token_embedding": {"embedding": to_np(
            sd[f"{base}.embeddings.token_embedding.weight"])},
        "positional_embedding": to_np(
            sd[f"{base}.embeddings.position_embedding.weight"]),
        "transformer": tr,
        "ln_final": {
            "scale": to_np(sd[f"{base}.final_layer_norm.weight"]),
            "bias": to_np(sd[f"{base}.final_layer_norm.bias"])},
        "text_projection": to_np(sd["text_projection.weight"]).T,
    }


def _hf_vision_params(sd, to_np):
    base = "vision_model"
    layers = len({k.split(".")[3] for k in sd
                  if k.startswith(f"{base}.encoder.layers.")})
    tr = {f"resblocks_{i}": _hf_block_params(
        sd, f"{base}.encoder.layers.{i}", to_np) for i in range(layers)}
    # HF's pre-LN attribute is (sic) `pre_layrnorm` in shipped checkpoints.
    pre = (f"{base}.pre_layrnorm" if f"{base}.pre_layrnorm.weight" in sd
           else f"{base}.pre_layernorm")
    return {
        "conv1": {"kernel": np.transpose(np.asarray(
            to_np(sd[f"{base}.embeddings.patch_embedding.weight"])),
            (2, 3, 1, 0))},
        "class_embedding": to_np(sd[f"{base}.embeddings.class_embedding"]),
        "positional_embedding": to_np(
            sd[f"{base}.embeddings.position_embedding.weight"]),
        "ln_pre": {"scale": to_np(sd[f"{pre}.weight"]),
                   "bias": to_np(sd[f"{pre}.bias"])},
        "transformer": tr,
        "ln_post": {"scale": to_np(sd[f"{base}.post_layernorm.weight"]),
                    "bias": to_np(sd[f"{base}.post_layernorm.bias"])},
        "proj": to_np(sd["visual_projection.weight"]).T,
    }
