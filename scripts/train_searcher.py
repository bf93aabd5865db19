#!/usr/bin/env python
"""Build a k-NN retrieval index over image-patch embeddings.

Parity target: `/root/reference/scripts/train_searcher.py` — builds a ScaNN
index over a CLIP patch-embedding database for retrieval-augmented sampling.
TPU-native variant: embeddings come from the in-repo image embedder and the
index is an exact MXU-matmul k-NN (`ealdm_tpu/retrieval.py`) — at the
database scales involved, exact matmul search on TPU is faster than an
approximate CPU index, so no ScaNN dependency is needed.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-d", "--database", type=str, required=True,
                   help="image dir or .npz embedding database")
    p.add_argument("-t", "--target_path", type=str, required=True,
                   help="output index path (.npz)")
    p.add_argument("-k", "--knn", type=int, default=10)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--num_leaves", type=int, default=None,
                   help="force a partitioned index with this many leaves "
                        "(default: size-based selection like the reference)")
    opt = p.parse_args()

    from ealdm_tpu.retrieval import Searcher, auto_build_searcher, build_image_database

    if opt.database.endswith(".npz"):
        import numpy as np

        db = dict(np.load(opt.database))
    else:
        db = build_image_database(opt.database, size=opt.size)
    if opt.num_leaves:
        searcher = Searcher.from_database(db)
        searcher.build_partitions(opt.num_leaves)
        # persist a probe count, else the loaded index silently falls back
        # to the exact full matmul (same ratio as the reference's
        # num_leaves_to_search = num_leaves//20, train_searcher.py:62-95)
        searcher.default_leaves_to_search = max(opt.num_leaves // 20, 1)
    else:
        searcher = auto_build_searcher(db)
    os.makedirs(os.path.dirname(opt.target_path) or ".", exist_ok=True)
    searcher.save(opt.target_path)
    print(
        f"Index with {searcher.num_entries} entries of dim "
        f"{searcher.dim} saved to {opt.target_path}"
    )


if __name__ == "__main__":
    main()
