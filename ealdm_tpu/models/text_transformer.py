"""Minimal text transformer backing the BERT-style conditioning encoder.

Capability stand-in for the reference's vendored lucidrains x_transformer
(`/root/reference/ldm/modules/x_transformer.py`: TransformerWrapper +
AttentionLayers + fixed positional embeddings) used by BERTEmbedder
(`encoders/modules.py:73-104`). Pre-norm self-attention encoder blocks with
GELU MLPs; weights importable from a reference checkpoint via the key-mapped
loader in utils/torch_import.py.

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


class EncoderBlock(nn.Module):
    dim: int
    heads: int = 8
    mlp_mult: int = 4
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        h = nn.LayerNorm(name="ln1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, name="attn",
            deterministic=deterministic, dropout_rate=self.dropout,
        )(h, h)
        x = x + h
        h = nn.LayerNorm(name="ln2")(x)
        h = nn.Dense(self.dim * self.mlp_mult, name="mlp_in", dtype=self.dtype)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, name="mlp_out", dtype=self.dtype)(h)
        return x + h


class TextTransformer(nn.Module):
    vocab_size: int
    max_len: int
    dim: int
    depth: int
    heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens, *, deterministic: bool = True):
        b, l = tokens.shape
        x = nn.Embed(self.vocab_size, self.dim, name="token_emb")(tokens)
        pos = nn.Embed(self.max_len, self.dim, name="pos_emb")(
            jnp.arange(l)[None, :].repeat(b, axis=0)
        )
        x = (x + pos).astype(self.dtype)
        for i in range(self.depth):
            x = EncoderBlock(self.dim, self.heads, name=f"block_{i}", dtype=self.dtype)(
                x, deterministic=deterministic
            )
        return nn.LayerNorm(name="ln_final")(x)
