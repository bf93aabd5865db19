"""Conditioning encoders (class, text, spatial), TPU-native flax.

Parity target: `/root/reference/ldm/modules/encoders/modules.py`:
  ClassEmbedder (21-33), TransformerEmbedder/BERTEmbedder (36-104, backed by
  the vendored x_transformer), SpatialRescaler (106-135),
  FrozenCLIPTextEmbedder/FrozenClipImageEmbedder (138-202).

The text encoders here use an in-repo transformer (`text_transformer.py`)
with a hash-bucket fallback tokenizer, so `txt2img`-style CFG sampling works
hermetically; pretrained-weight import hooks are provided for parity runs.
CLIP-scale embedders are architecture-complete with loadable weights (no
download in this environment).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .text_transformer import SimpleTokenizer, TextTransformer


class ClassEmbedder(nn.Module):
    embed_dim: int
    n_classes: int = 1000

    @nn.compact
    def __call__(self, c, *, deterministic: bool = True):
        c = c.astype(jnp.int32)
        if c.ndim > 1:
            c = c[:, 0]
        return nn.Embed(self.n_classes, self.embed_dim, name="embedding")(c)[:, None, :]


class TransformerEmbedder(nn.Module):
    """Token ids -> [B, L, n_embed] via a causal-free transformer encoder."""

    n_embed: int
    n_layer: int
    vocab_size: int = 30522
    max_seq_len: int = 77
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens, *, deterministic: bool = True):
        return TextTransformer(
            vocab_size=self.vocab_size,
            max_len=self.max_seq_len,
            dim=self.n_embed,
            depth=self.n_layer,
            name="transformer",
            dtype=self.dtype,
        )(tokens, deterministic=deterministic)


class BERTEmbedder(nn.Module):
    """Text -> cross-attention context (reference BERTEmbedder shape contract).

    Tokenization happens host-side via `tokenize()`; the module consumes ids.
    """

    n_embed: int
    n_layer: int
    vocab_size: int = 30522
    max_seq_len: int = 77
    dtype: Any = jnp.float32

    def setup(self):
        self.transformer = TextTransformer(
            vocab_size=self.vocab_size,
            max_len=self.max_seq_len,
            dim=self.n_embed,
            depth=self.n_layer,
            dtype=self.dtype,
        )
        self._tokenizer = SimpleTokenizer(self.vocab_size, self.max_seq_len)

    def tokenize(self, texts: Sequence[str]) -> jnp.ndarray:
        return self._tokenizer(texts)

    def __call__(self, tokens, *, deterministic: bool = True):
        return self.transformer(tokens, deterministic=deterministic)


class SpatialRescaler(nn.Module):
    """n stages of 2x (bi)linear/nearest rescale + optional 1x1 channel map."""

    n_stages: int = 1
    method: str = "bilinear"
    multiplier: float = 0.5
    in_channels: int = 3
    out_channels: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        assert self.method in ("nearest", "linear", "bilinear", "trilinear", "bicubic", "area")
        method = {"area": "linear", "trilinear": "linear"}.get(self.method, self.method)
        for _ in range(self.n_stages):
            n, h, w, c = x.shape
            new = (n, max(int(h * self.multiplier), 1), max(int(w * self.multiplier), 1), c)
            x = jax.image.resize(x, new, method="nearest" if method == "nearest" else "bilinear")
        if self.out_channels is not None:
            x = nn.Conv(self.out_channels, (1, 1), use_bias=False, name="channel_mapper",
                        dtype=self.dtype)(x)
        return x


# OpenAI CLIP release geometries (clip/model.py): version -> tower dims.
CLIP_VERSIONS = {
    # text: (width, layers, heads, embed); vision: (width, layers, heads,
    # patch, embed)
    "ViT-B/32": {"text": (512, 12, 8, 512), "vision": (768, 12, 12, 32, 512)},
    "ViT-B/16": {"text": (512, 12, 8, 512), "vision": (768, 12, 12, 16, 512)},
    "ViT-L/14": {"text": (768, 12, 12, 768),
                 "vision": (1024, 24, 16, 14, 768)},
}


class FrozenCLIPTextEmbedder(nn.Module):
    """Frozen CLIP text embedder (reference encoders/modules.py:138-170,
    `clip.load('ViT-L/14')`): tokenized text -> EOT-pooled CLIP feature,
    L2-normalized, repeated to n_repeat context tokens.

    The trunk is a FAITHFUL CLIP text transformer (models/clip.py: causal
    mask, EOT pooling, text_projection) so OpenAI/HF checkpoints import
    exactly (`clip.load_torch_clip_state`, oracle-tested). Tokenization uses
    the hermetic SimpleTokenizer; real CLIP-BPE ids can be fed directly."""

    n_embed: int = 512
    n_layer: int = 12
    width: int = 512
    n_heads: int = 8
    vocab_size: int = 49408
    max_seq_len: int = 77
    n_repeat: int = 1
    normalize: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        from .clip import CLIPTextTower

        self._tokenizer = SimpleTokenizer(self.vocab_size, self.max_seq_len)
        eos = getattr(self._tokenizer, "EOS", None)
        if self._tokenizer._wordpiece is not None:
            eos = self._tokenizer._wordpiece.sep_id
        self.transformer = CLIPTextTower(
            vocab_size=self.vocab_size, context_length=self.max_seq_len,
            width=self.width, layers=self.n_layer, heads=self.n_heads,
            embed_dim=self.n_embed, eot_id=eos, name="model",
            dtype=self.dtype,
        )

    @classmethod
    def from_version(cls, version: str = "ViT-L/14", **kw):
        """Geometry matching `clip.load(version)` (the reference ctor's
        `version` arg, encoders/modules.py:142)."""
        w, l, h, e = CLIP_VERSIONS[version]["text"]
        return cls(n_embed=e, n_layer=l, width=w, n_heads=h, **kw)

    def tokenize(self, texts):
        return self._tokenizer(texts)

    def __call__(self, tokens, *, deterministic: bool = True):
        z = self.transformer(tokens)
        if self.normalize:
            z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-8)
        return jnp.repeat(z[:, None, :], self.n_repeat, axis=1)


class FrozenClipImageEmbedder(nn.Module):
    """Frozen CLIP image embedder (reference encoders/modules.py:173-202):
    [-1,1] NHWC image -> CLIP preprocess (resize + channel stats) -> ViT
    visual tower (models/clip.py, OpenAI/HF-importable) -> L2-normalized
    embedding. Default geometry is ViT-B/32 (the third stage's
    `openai/clip-vit-base-patch32`, third_stage_model.py:281)."""

    out_dim: int = 512
    image_size: int = 224
    patch_size: int = 32
    width: int = 768
    n_layer: int = 12
    n_heads: int = 12
    dtype: Any = jnp.float32

    @classmethod
    def from_version(cls, version: str = "ViT-L/14", **kw):
        w, l, h, p, e = CLIP_VERSIONS[version]["vision"]
        return cls(out_dim=e, width=w, n_layer=l, n_heads=h, patch_size=p,
                   **kw)

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        from .clip import CLIPVisionTower, clip_preprocess

        x = clip_preprocess(x, self.image_size)
        z = CLIPVisionTower(
            image_size=self.image_size, patch_size=self.patch_size,
            width=self.width, layers=self.n_layer, heads=self.n_heads,
            embed_dim=self.out_dim, name="visual", dtype=self.dtype,
        )(x)
        return z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-8)


class HybridConditioner(nn.Module):
    """Two config-built conditioners producing the hybrid context dict
    (`HybridConditioner`, ldm/modules/diffusionmodules/util.py:251-261)."""

    c_concat_config: Dict[str, Any]
    c_crossattn_config: Dict[str, Any]
    dtype: Any = jnp.float32

    def setup(self):
        self.concat_conditioner = build_encoder(
            self.c_concat_config["target"],
            dict(self.c_concat_config.get("params", {})), dtype=self.dtype,
        )
        self.crossattn_conditioner = build_encoder(
            self.c_crossattn_config["target"],
            dict(self.c_crossattn_config.get("params", {})), dtype=self.dtype,
        )

    def __call__(self, c_concat, c_crossattn):
        c_concat = self.concat_conditioner(c_concat)
        c_crossattn = self.crossattn_conditioner(c_crossattn)
        return {"c_concat": [c_concat], "c_crossattn": [c_crossattn]}


def build_encoder(target: str, params: Dict[str, Any], dtype=jnp.float32):
    """Registry for reference cond-encoder targets -> TPU-native modules."""
    name = target.rsplit(".", 1)[-1]
    if name == "ClassEmbedder":
        return ClassEmbedder(
            embed_dim=params["embed_dim"], n_classes=params.get("n_classes", 1000)
        )
    if name == "BERTEmbedder":
        return BERTEmbedder(
            n_embed=params["n_embed"],
            n_layer=params["n_layer"],
            vocab_size=params.get("vocab_size", 30522),
            max_seq_len=params.get("max_seq_len", 77),
            dtype=dtype,
        )
    if name == "TransformerEmbedder":
        return TransformerEmbedder(
            n_embed=params["n_embed"],
            n_layer=params["n_layer"],
            vocab_size=params.get("vocab_size", 30522),
            max_seq_len=params.get("max_seq_len", 77),
            dtype=dtype,
        )
    if name == "SpatialRescaler":
        return SpatialRescaler(**params, dtype=dtype)
    if name == "FrozenCLIPTextEmbedder":
        kw = {}
        if "n_repeat" in params:
            kw["n_repeat"] = params["n_repeat"]
        if "normalize" in params:
            kw["normalize"] = params["normalize"]
        version = params.get("version", "ViT-L/14")
        return FrozenCLIPTextEmbedder.from_version(version, dtype=dtype, **kw)
    if name == "FrozenClipImageEmbedder":
        version = params.get("model", "ViT-L/14")
        return FrozenClipImageEmbedder.from_version(version, dtype=dtype)
    if name == "HybridConditioner":
        return HybridConditioner(
            c_concat_config=params["c_concat_config"],
            c_crossattn_config=params["c_crossattn_config"],
            dtype=dtype,
        )
    if name == "Identity":
        # torch.nn.Identity cond stage (retrieval-augmented-diffusion
        # 768x768.yaml): the conditioning is a precomputed embedding passed
        # through unchanged.
        return None
    raise ValueError(f"unknown cond stage target: {target}")
