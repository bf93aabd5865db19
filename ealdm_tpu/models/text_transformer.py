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
        from ..data.tokenizer import (
            VOCAB_ENV_VAR,
            WordPieceTokenizer,
            default_vocab_path,
        )

        path = vocab_path or default_vocab_path()
        if not os.path.exists(path) and os.environ.get(VOCAB_ENV_VAR):
            # an explicitly configured vocab must not silently degrade to
            # the hash-bucket fallback (ids would differ with no error)
            raise FileNotFoundError(
                f"{VOCAB_ENV_VAR} points at nonexistent vocab file {path!r}"
            )
        if os.path.exists(path):
            wp = WordPieceTokenizer(path, max_len=max_len)
            if len(wp) <= vocab_size:
                self._wordpiece = wp
                self.PAD = wp.pad_id
            elif vocab_path is not None or os.environ.get(VOCAB_ENV_VAR):
                # an explicitly configured vocab must not silently degrade to
                # the hash-bucket fallback (ids would differ with no error)
                raise ValueError(
                    f"vocab file {path!r} has {len(wp)} entries, exceeding the "
                    f"model's vocab_size={vocab_size}; refusing to silently "
                    "fall back to hash-bucket token ids"
                )

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


class ScaleNormX(nn.Module):
    """`ScaleNorm` (x_transformer.py:137-147): L2-norm scaled by dim^-0.5,
    single learned scalar gain."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (1,))
        n = jnp.linalg.norm(x, axis=-1, keepdims=True) * (self.dim**-0.5)
        return x / jnp.clip(n, self.eps) * g


class RMSNormX(nn.Module):
    """`RMSNorm` (x_transformer.py:150-159): same normaliser as ScaleNorm
    but a per-channel learned gain and eps 1e-8."""

    dim: int
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (self.dim,))
        n = jnp.linalg.norm(x, axis=-1, keepdims=True) * (self.dim**-0.5)
        return x / jnp.clip(n, self.eps) * g


class RezeroGate(nn.Module):
    """`Rezero` branch gate (x_transformer.py:126-134): zero-init learned
    scalar on the attention branch output."""

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.zeros, (1,))
        return x * g


class GRUGate(nn.Module):
    """`GRUGating` residual (x_transformer.py:168-180): torch GRUCell with
    the branch output as input and the residual stream as hidden state.
    Gate chunk order (r, z, n) matches torch's stacked weight layout."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, out, residual):
        gi = nn.Dense(3 * self.dim, name="gru_ih", dtype=self.dtype)(out)
        gh = nn.Dense(3 * self.dim, name="gru_hh", dtype=self.dtype)(residual)
        ri, zi, ni = jnp.split(gi, 3, axis=-1)
        rh, zh, nh = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(ri + rh)
        z = jax.nn.sigmoid(zi + zh)
        n = jnp.tanh(ni + r * nh)
        return (1.0 - z) * n + z * residual


def fixed_positional_embedding(n: int, dim: int, dtype=jnp.float32):
    """`FixedPositionalEmbedding` sinusoid (x_transformer.py:36-47):
    [n, dim] with sin block then cos block."""
    inv_freq = 1.0 / (10000 ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    t = jnp.arange(n, dtype=jnp.float32)
    s = jnp.einsum("i,j->ij", t, inv_freq)
    return jnp.concatenate([jnp.sin(s), jnp.cos(s)], axis=-1).astype(dtype)


class XAttention(nn.Module):
    """x_transformer Attention (`x_transformer.py:215-368`): q/k/v project
    to heads*dim_head (64 per head by default, independent of model dim, no
    bias), scaled dot-product with fp32 softmax, to_out back to dim.
    Supports shortformer position-infused inputs (`sinusoid`) and
    residual-attention logit carry (`prev_attn`)."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x, context=None, *, sinusoid=None, prev_attn=None,
        return_attn: bool = False, deterministic: bool = True,
    ):
        kv = x if context is None else context
        q_in, k_in = x, kv
        if sinusoid is not None:
            q_in = q_in + sinusoid[None, : q_in.shape[1]]
            k_in = k_in + sinusoid[None, : k_in.shape[1]]
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, name="to_q", dtype=self.dtype)(q_in)
        k = nn.Dense(inner, use_bias=False, name="to_k", dtype=self.dtype)(k_in)
        v = nn.Dense(inner, use_bias=False, name="to_v", dtype=self.dtype)(kv)
        b, n, _ = q.shape
        m = k.shape[1]
        q = q.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        k = k.reshape(b, m, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        v = v.reshape(b, m, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        dots = jnp.einsum("bhid,bhjd->bhij", q, k) * (self.dim_head**-0.5)
        if prev_attn is not None:
            dots = dots + prev_attn
        pre_softmax = dots
        attn = jax.nn.softmax(dots.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = nn.Dense(self.dim, name="to_out", dtype=self.dtype)(out)
        if return_attn:
            return out, pre_softmax
        return out


class XFeedForward(nn.Module):
    """x_transformer FeedForward (`x_transformer.py:194-212`): Linear ->
    exact GELU -> Linear, or GEGLU (`x_transformer.py:184-191`) when glu."""

    dim: int
    mult: int = 4
    glu: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        if self.glu:
            proj = nn.Dense(inner * 2, name="ff_in", dtype=self.dtype)(x)
            h, gate = jnp.split(proj, 2, axis=-1)
            h = h * nn.gelu(gate, approximate=False)
        else:
            h = nn.Dense(inner, name="ff_in", dtype=self.dtype)(x)
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
    # Encoder option surface (`x_transformer.py:370-462`), reference defaults.
    use_scalenorm: bool = False
    use_rmsnorm: bool = False
    use_rezero: bool = False
    gate_residual: bool = False
    ff_glu: bool = False
    macaron: bool = False
    sandwich_coef: Optional[int] = None
    position_infused_attn: bool = False
    pre_norm: bool = True
    residual_attn: bool = False
    dtype: Any = jnp.float32

    @staticmethod
    def layer_types_for(
        depth: int, macaron: bool = False, sandwich_coef: Optional[int] = None
    ):
        """Layer-type sequence (`x_transformer.py:424-452`): ('a','f') blocks,
        macaron prepends an extra 'f', sandwich front-loads attention."""
        block = ("f", "a", "f") if macaron else ("a", "f")
        if sandwich_coef is not None:
            assert 0 < sandwich_coef <= depth, "sandwich coefficient out of range"
            return (
                ("a",) * sandwich_coef
                + block * (depth - sandwich_coef)
                + ("f",) * sandwich_coef
            )
        return block * depth

    def _norm(self, name: str):
        if self.use_rezero:
            return lambda x: x  # norm_fn = nn.Identity (x_transformer.py:421)
        if self.use_rmsnorm:
            return RMSNormX(self.dim, name=name)
        if self.use_scalenorm:
            return ScaleNormX(self.dim, name=name)
        return nn.LayerNorm(epsilon=1e-5, name=name)

    @nn.compact
    def __call__(self, tokens, *, deterministic: bool = True):
        b, l = tokens.shape
        x = nn.Embed(self.vocab_size, self.dim, name="token_emb")(tokens)
        if self.position_infused_attn:
            # shortformer mode: absolute pos-emb disabled, sinusoid goes into
            # each attention's q/k inputs (x_transformer.py:405-406,596-599)
            sinusoid = fixed_positional_embedding(l, self.dim, self.dtype)
            x = x.astype(self.dtype)
        else:
            sinusoid = None
            pos = nn.Embed(self.max_len, self.dim, name="pos_emb")(jnp.arange(l))
            x = (x + pos[None]).astype(self.dtype)

        layer_types = self.layer_types_for(
            self.depth, self.macaron, self.sandwich_coef
        )
        prev_attn = None
        a_idx = f_idx = 0
        for j, lt in enumerate(layer_types):
            is_last = j == len(layer_types) - 1
            if lt == "a":
                name = f"layer_{a_idx}_attn"
                a_idx += 1
            else:
                name = f"layer_{f_idx}_ff"
                f_idx += 1
            norm = self._norm(f"{name}_norm")
            residual = x
            h = norm(x) if self.pre_norm else x
            if lt == "a":
                out, pre = XAttention(
                    self.dim, self.heads, self.dim_head,
                    name=name, dtype=self.dtype,
                )(
                    h, sinusoid=sinusoid, prev_attn=prev_attn,
                    return_attn=True, deterministic=deterministic,
                )
                if self.use_rezero:
                    # Rezero wraps only Attention (x_transformer.py:468-469)
                    out = RezeroGate(name=f"{name}_rezero")(out)
                if self.residual_attn:
                    prev_attn = pre
            else:
                out = XFeedForward(
                    self.dim, glu=self.ff_glu, name=name, dtype=self.dtype
                )(h)
                if self.macaron:
                    out = 0.5 * out  # Scale(0.5, ff), x_transformer.py:463
            if self.gate_residual:
                x = GRUGate(self.dim, name=f"{name}_gate", dtype=self.dtype)(
                    out, residual
                )
            else:
                x = residual + out
            if not self.pre_norm and not is_last:
                x = norm(x)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x)
