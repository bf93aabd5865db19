"""Text transformer backing the BERT-style conditioning encoder.

Structurally faithful port of the reference's vendored lucidrains
x_transformer (`/root/reference/ldm/modules/x_transformer.py`:
TransformerWrapper + Encoder AttentionLayers) at its BERTEmbedder defaults
(`encoders/modules.py:73-104`): learned absolute positional embedding,
pre-norm ('a','f') blocks with 64-dim heads and plain residuals, exact-GELU
FFN, final LayerNorm. Output parity against the actual torch module is
asserted in tests/test_torch_parity.py via
utils.torch_import.text_transformer_key_map.

The tokenizer delegates to the in-repo WordPiece implementation
(`ealdm_tpu.data.tokenizer`, BERT-uncased semantics over the committed
`vocab_en.txt`; reference `encoders/modules.py:57-60` uses HF
bert-base-uncased). A deterministic hash-bucket scheme remains as fallback
when no vocab file is present, and `set_encode_fn` swaps in any external
tokenizer.
"""
from __future__ import annotations

import hashlib
import os
import re
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class SimpleTokenizer:
    """WordPiece tokenizer (committed vocab) with hash-bucket fallback."""

    PAD, BOS, EOS, UNK = 0, 1, 2, 3
    _RESERVED = 4

    def __init__(
        self,
        vocab_size: int = 30522,
        max_len: int = 77,
        vocab_path: Optional[str] = None,
    ):
        self.vocab_size = vocab_size
        self.max_len = max_len
        self._encode_fn: Optional[Callable] = None
        self._wordpiece = None
        from ..data.tokenizer import DEFAULT_VOCAB_PATH, WordPieceTokenizer

        path = vocab_path or DEFAULT_VOCAB_PATH
        if os.path.exists(path):
            wp = WordPieceTokenizer(path, max_len=max_len)
            if len(wp) <= vocab_size:
                self._wordpiece = wp
                self.PAD = wp.pad_id

    def set_encode_fn(self, fn: Callable[[str], Sequence[int]]):
        self._encode_fn = fn

    def _bucket(self, word: str) -> int:
        h = int.from_bytes(hashlib.md5(word.encode()).digest()[:4], "little")
        return self._RESERVED + h % (self.vocab_size - self._RESERVED)

    def encode(self, text: str) -> list[int]:
        if self._encode_fn is not None:
            return list(self._encode_fn(text))[: self.max_len]
        if self._wordpiece is not None:
            return self._wordpiece.encode(text)
        words = re.findall(r"[a-z0-9]+|[^\sa-z0-9]", text.lower())
        ids = [self.BOS] + [self._bucket(w) for w in words][: self.max_len - 2] + [self.EOS]
        return ids

    def __call__(self, texts: Sequence[str]) -> jnp.ndarray:
        out = np.full((len(texts), self.max_len), self.PAD, np.int32)
        for i, t in enumerate(texts):
            ids = self.encode(t)
            out[i, : len(ids)] = ids
        return jnp.asarray(out)


class XAttention(nn.Module):
    """x_transformer Attention (`x_transformer.py:215-368`): q/k/v project
    to heads*dim_head (64 per head by default, independent of model dim, no
    bias), scaled dot-product with fp32 softmax, to_out back to dim."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, *, deterministic: bool = True):
        kv = x if context is None else context
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, name="to_q", dtype=self.dtype)(x)
        k = nn.Dense(inner, use_bias=False, name="to_k", dtype=self.dtype)(kv)
        v = nn.Dense(inner, use_bias=False, name="to_v", dtype=self.dtype)(kv)
        b, n, _ = q.shape
        m = k.shape[1]
        q = q.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        k = k.reshape(b, m, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        v = v.reshape(b, m, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        dots = jnp.einsum("bhid,bhjd->bhij", q, k) * (self.dim_head**-0.5)
        attn = jax.nn.softmax(dots.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        return nn.Dense(self.dim, name="to_out", dtype=self.dtype)(out)


class XFeedForward(nn.Module):
    """x_transformer FeedForward (`x_transformer.py:194-212`): Linear ->
    exact GELU -> Linear, mult 4, no GLU by default."""

    dim: int
    mult: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim * self.mult, name="ff_in", dtype=self.dtype)(x)
        h = nn.gelu(h, approximate=False)
        return nn.Dense(self.dim, name="ff_out", dtype=self.dtype)(h)


class TextTransformer(nn.Module):
    """TransformerWrapper + Encoder AttentionLayers, structurally faithful
    to the reference's vendored lucidrains lib (`x_transformer.py:370-539,
    548-641`) at its BERTEmbedder defaults: learned absolute positional
    embedding, pre-norm ('a','f')*depth blocks with plain residuals, final
    LayerNorm, return_embeddings=True (no logit head). Weight-importable via
    utils.torch_import.text_transformer_key_map."""

    vocab_size: int
    max_len: int
    dim: int
    depth: int
    heads: int = 8
    dim_head: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens, *, deterministic: bool = True):
        b, l = tokens.shape
        x = nn.Embed(self.vocab_size, self.dim, name="token_emb")(tokens)
        pos = nn.Embed(self.max_len, self.dim, name="pos_emb")(jnp.arange(l))
        x = (x + pos[None]).astype(self.dtype)
        for i in range(self.depth):
            h = nn.LayerNorm(epsilon=1e-5, name=f"layer_{i}_attn_norm")(x)
            x = x + XAttention(
                self.dim, self.heads, self.dim_head,
                name=f"layer_{i}_attn", dtype=self.dtype,
            )(h, deterministic=deterministic)
            h = nn.LayerNorm(epsilon=1e-5, name=f"layer_{i}_ff_norm")(x)
            x = x + XFeedForward(self.dim, name=f"layer_{i}_ff", dtype=self.dtype)(h)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x)
