"""Train the committed WordPiece vocab from on-disk English prose.

The reference tokenizes with bert-base-uncased's 30,522-token vocab
(`/root/reference/ldm/modules/encoders/modules.py:57-60`), which cannot be
downloaded in this zero-egress environment. This script regenerates
`ealdm_tpu/data/vocab_en.txt` from English text already present in the
image (package READMEs/docs/metadata) via the in-repo WordPiece trainer,
at a scale (default 12k) where ordinary prompts tokenize into word-level
pieces instead of shattering to characters. The result keeps exact HF
BertTokenizer id parity on the emitted file (tests/test_tokenizer.py).

Usage: python scripts/train_tokenizer.py [--vocab-size 12000] [--out PATH]
"""
from __future__ import annotations

import argparse
import glob
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ealdm_tpu.data.tokenizer import (  # noqa: E402
    save_vocab, train_wordpiece_fast,
)

_SOURCES = (
    "/opt/venv/lib/python3.12/site-packages/**/*.md",
    "/opt/venv/lib/python3.12/site-packages/**/*.rst",
    "/opt/venv/lib/python3.12/site-packages/**/METADATA",
    "/usr/lib/python3.12/**/*.rst",
)

_CODE_LINE = re.compile(
    r"^\s*(>>>|\.\.\s|#|import |from |def |class |\$|@|\||`{3})")
_URLISH = re.compile(r"https?://|[/\\]{2}|[{}<>]|={3,}|-{4,}")


def harvest_lines(patterns=_SOURCES, max_mb: float = 40.0):
    """Yield prose-looking lines from doc files (skips code/urls/tables)."""
    budget = max_mb * 1e6
    seen = set()
    for pat in patterns:
        for path in sorted(glob.glob(pat, recursive=True)):
            if budget <= 0:
                return
            try:
                with open(path, errors="ignore") as f:
                    text = f.read(1 << 20)
            except OSError:
                continue
            for line in text.splitlines():
                line = line.strip()
                if len(line) < 16 or _CODE_LINE.match(line):
                    continue
                if _URLISH.search(line):
                    continue
                ascii_ratio = sum(c.isascii() for c in line) / len(line)
                alpha_ratio = sum(c.isalpha() or c.isspace()
                                  for c in line) / len(line)
                if ascii_ratio < 0.97 or alpha_ratio < 0.6:
                    continue
                h = hash(line)
                if h in seen:
                    continue
                seen.add(h)
                budget -= len(line)
                yield line


def committed_corpus_lines():
    """Lines from the committed supplementary corpus (domain vocabulary for
    the prompt/caption surface: common English, weather, scenes)."""
    path = os.path.join(os.path.dirname(__file__), "..", "ealdm_tpu",
                        "data", "corpus_extra.txt")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [l.strip() for l in f if l.strip()]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocab-size", type=int, default=12000)
    ap.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(__file__), "..", "ealdm_tpu",
                             "data", "vocab_en.txt"),
    )
    ap.add_argument("--max-mb", type=float, default=40.0)
    args = ap.parse_args()

    lines = committed_corpus_lines() + list(harvest_lines(max_mb=args.max_mb))
    print(f"harvested {len(lines)} prose lines "
          f"({sum(map(len, lines)) / 1e6:.1f} MB)")
    vocab = train_wordpiece_fast(lines, vocab_size=args.vocab_size)
    save_vocab(vocab, args.out)
    print(f"wrote {len(vocab)} tokens -> {args.out}")


if __name__ == "__main__":
    main()
