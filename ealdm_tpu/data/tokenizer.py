"""WordPiece tokenizer (BERT-uncased semantics) with an in-repo vocab.

The reference conditions txt2img/knn2img through the HF
`bert-base-uncased` tokenizer (`/root/reference/ldm/modules/encoders/
modules.py:57-60`). This module implements the same algorithm exactly —
BasicTokenizer (clean, lowercase, accent-strip, punctuation/CJK split) +
greedy longest-match-first WordPiece with `##` continuations — so that,
pointed at the real `vocab.txt`, it reproduces HF token ids bit-for-bit
(asserted in tests against `transformers.BertTokenizer` running on the same
vocab file). The environment is zero-egress, so the committed default vocab
(`vocab_en.txt`) is a compact English vocab built by `train_wordpiece`;
swap in a full BERT vocab via `vocab_path`, or globally by pointing the
``EALDM_VOCAB_PATH`` env var at a real 30,522-line ``vocab.txt``
(``default_vocab_path``) — every tokenizer construction site resolves
through it, so a deployment drops in `bert-base-uncased` ids end to end.
"""
from __future__ import annotations

import os
import unicodedata
from collections import Counter, defaultdict
from typing import Dict, Iterable, List, Sequence

import numpy as np

DEFAULT_VOCAB_PATH = os.path.join(os.path.dirname(__file__), "vocab_en.txt")

VOCAB_ENV_VAR = "EALDM_VOCAB_PATH"


def default_vocab_path() -> str:
    """Vocab file every tokenizer uses unless given an explicit path:
    $EALDM_VOCAB_PATH (e.g. a real `bert-base-uncased` vocab.txt) when set,
    else the committed compact vocab."""
    return os.environ.get(VOCAB_ENV_VAR) or DEFAULT_VOCAB_PATH

PAD, UNK, CLS, SEP, MASK = "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"
SPECIALS = (PAD, UNK, CLS, SEP, MASK)


# ------------------------------------------------------------ basic tokenizer
def _is_control(ch: str) -> bool:
    if ch in ("\t", "\n", "\r"):
        return False
    return unicodedata.category(ch).startswith("C")


def _is_whitespace(ch: str) -> bool:
    if ch in (" ", "\t", "\n", "\r"):
        return True
    return unicodedata.category(ch) == "Zs"


def _is_punctuation(ch: str) -> bool:
    cp = ord(ch)
    # ASCII ranges treated as punctuation by BERT even when unicode says no
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_cjk(cp: int) -> bool:
    return (
        0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF
        or 0x20000 <= cp <= 0x2A6DF or 0x2A700 <= cp <= 0x2B73F
        or 0x2B740 <= cp <= 0x2B81F or 0x2B820 <= cp <= 0x2CEAF
        or 0xF900 <= cp <= 0xFAFF or 0x2F800 <= cp <= 0x2FA1F
    )


def basic_tokenize(text: str, lowercase: bool = True) -> List[str]:
    """BERT BasicTokenizer: clean -> CJK-space -> lower+strip accents ->
    punctuation split -> whitespace split."""
    out_chars = []
    for ch in text:
        cp = ord(ch)
        if cp == 0 or cp == 0xFFFD or _is_control(ch):
            continue
        if _is_cjk(cp):
            out_chars.append(f" {ch} ")
        elif _is_whitespace(ch):
            out_chars.append(" ")
        else:
            out_chars.append(ch)
    tokens = "".join(out_chars).split()

    split: List[str] = []
    for tok in tokens:
        if lowercase:
            tok = tok.lower()
            tok = unicodedata.normalize("NFD", tok)
            tok = "".join(c for c in tok if unicodedata.category(c) != "Mn")
        # split on punctuation, keeping each punct char as its own token
        buf: List[str] = []
        for ch in tok:
            if _is_punctuation(ch):
                if buf:
                    split.append("".join(buf))
                    buf = []
                split.append(ch)
            else:
                buf.append(ch)
        if buf:
            split.append("".join(buf))
    return split


# ---------------------------------------------------------------- WordPiece
def wordpiece_split(word: str, vocab: Dict[str, int], max_chars: int = 100) -> List[str]:
    """Greedy longest-match-first; whole word becomes [UNK] on any failure."""
    if len(word) > max_chars:
        return [UNK]
    pieces: List[str] = []
    start = 0
    while start < len(word):
        end = len(word)
        cur = None
        while start < end:
            sub = word[start:end]
            if start > 0:
                sub = "##" + sub
            if sub in vocab:
                cur = sub
                break
            end -= 1
        if cur is None:
            return [UNK]
        pieces.append(cur)
        start = end
    return pieces


class WordPieceTokenizer:
    """BERT-uncased-compatible tokenizer over a vocab.txt (one token/line)."""

    def __init__(
        self,
        vocab_path: str = None,
        max_len: int = 77,
        lowercase: bool = True,
    ):
        vocab_path = vocab_path or default_vocab_path()
        with open(vocab_path) as f:
            tokens = [line.rstrip("\n") for line in f if line.rstrip("\n")]
        self.vocab: Dict[str, int] = {t: i for i, t in enumerate(tokens)}
        self.inv_vocab = {i: t for t, i in self.vocab.items()}
        self.max_len = max_len
        self.lowercase = lowercase
        for s in SPECIALS:
            assert s in self.vocab, f"vocab missing special token {s}"
        self.pad_id = self.vocab[PAD]
        self.unk_id = self.vocab[UNK]
        self.cls_id = self.vocab[CLS]
        self.sep_id = self.vocab[SEP]

    def __len__(self):
        return len(self.vocab)

    def tokenize(self, text: str) -> List[str]:
        out: List[str] = []
        for word in basic_tokenize(text, self.lowercase):
            out.extend(wordpiece_split(word, self.vocab))
        return out

    def encode(self, text: str) -> List[int]:
        """[CLS] pieces... [SEP], truncated to max_len (HF convention)."""
        ids = [self.vocab.get(t, self.unk_id) for t in self.tokenize(text)]
        ids = ids[: self.max_len - 2]
        return [self.cls_id] + ids + [self.sep_id]

    def decode(self, ids: Sequence[int]) -> str:
        toks = [self.inv_vocab.get(int(i), UNK) for i in ids]
        toks = [t for t in toks if t not in (PAD, CLS, SEP)]
        text = " ".join(toks).replace(" ##", "")
        return text

    def __call__(self, texts: Sequence[str]):
        import jax.numpy as jnp

        out = np.full((len(texts), self.max_len), self.pad_id, np.int32)
        for i, t in enumerate(texts):
            ids = self.encode(t)
            out[i, : len(ids)] = ids
        return jnp.asarray(out)


# ------------------------------------------------------------------ trainer
def train_wordpiece(
    corpus: Iterable[str],
    vocab_size: int = 8000,
    min_pair_freq: int = 2,
    lowercase: bool = True,
) -> List[str]:
    """Train a WordPiece vocab (likelihood-scored pair merges, as in the
    original WordPiece/BERT recipe: score = freq(ab) / (freq(a)*freq(b))).

    Returns the vocab as an ordered token list (specials first, then single
    characters, then learned merges)."""
    word_freq: Counter = Counter()
    for line in corpus:
        for w in basic_tokenize(line, lowercase):
            word_freq[w] += 1

    # each word as a tuple of pieces: first char, then ##-continuations
    def to_pieces(w: str):
        return tuple([w[0]] + ["##" + c for c in w[1:]])

    words = {w: to_pieces(w) for w in word_freq}
    alphabet = sorted({p for pieces in words.values() for p in pieces})
    vocab: List[str] = list(SPECIALS) + alphabet

    while len(vocab) < vocab_size:
        piece_freq: Counter = Counter()
        pair_freq: Counter = Counter()
        for w, pieces in words.items():
            f = word_freq[w]
            for p in pieces:
                piece_freq[p] += f
            for a, b in zip(pieces, pieces[1:]):
                pair_freq[(a, b)] += f
        best, best_score = None, 0.0
        for (a, b), f in pair_freq.items():
            if f < min_pair_freq:
                continue
            score = f / (piece_freq[a] * piece_freq[b])
            if score > best_score:
                best, best_score = (a, b), score
        if best is None:
            break
        a, b = best
        merged = a + b[2:] if b.startswith("##") else a + b
        vocab.append(merged)
        new_words = {}
        for w, pieces in words.items():
            out: List[str] = []
            i = 0
            while i < len(pieces):
                if i + 1 < len(pieces) and pieces[i] == a and pieces[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(pieces[i])
                    i += 1
            new_words[w] = tuple(out)
        words = new_words
    return vocab


def save_vocab(vocab: Sequence[str], path: str) -> None:
    with open(path, "w") as f:
        f.write("\n".join(vocab) + "\n")


def train_wordpiece_fast(
    corpus: Iterable[str],
    vocab_size: int = 12000,
    min_pair_freq: int = 3,
    lowercase: bool = True,
    batch_size: int = 200,
    max_word_len: int = 24,
    seed_top_words: int = 6000,
    seed_min_freq: int = 8,
) -> List[str]:
    """Scalable WordPiece trainer for real-size (>=8k) vocabularies.

    Same likelihood scoring as `train_wordpiece`
    (score = freq(ab) / (freq(a) * freq(b))), but selects the top
    `batch_size` NON-INTERACTING pairs per round (no selected pair shares a
    piece with an earlier selection in the same round) and re-scores
    between rounds, and only re-segments words that contain a selected
    pair (inverted pair->word index). Exact greedy order is traded for
    tractability — coverage-equivalent at these sizes. Deterministic.
    """
    word_freq: Counter = Counter()
    for line in corpus:
        for w in basic_tokenize(line, lowercase):
            if len(w) <= max_word_len:
                word_freq[w] += 1

    words = {
        w: tuple([w[0]] + ["##" + c for c in w[1:]]) for w in word_freq
    }
    alphabet = sorted({p for pieces in words.values() for p in pieces})
    vocab: List[str] = list(SPECIALS) + alphabet
    vocab_set = set(vocab)

    # Seed the most frequent whole words as single tokens (what greedy merge
    # training converges to on a large corpus; the likelihood score's
    # exclusivity bias starves common-word merges on small corpora, so "the"
    # would otherwise shatter). Seeded words contribute no pair stats.
    if seed_top_words:
        for w, f in word_freq.most_common():
            if len(vocab) >= len(SPECIALS) + len(alphabet) + seed_top_words:
                break
            if f < seed_min_freq or len(w) < 2 or w in vocab_set:
                continue
            vocab.append(w)
            vocab_set.add(w)
            words[w] = (w,)

    while len(vocab) < vocab_size:
        piece_freq: Counter = Counter()
        pair_freq: Counter = Counter()
        index: Dict[tuple, List[str]] = {}
        for w, pieces in words.items():
            f = word_freq[w]
            for p in pieces:
                piece_freq[p] += f
            for pr in zip(pieces, pieces[1:]):
                pair_freq[pr] += f
                index.setdefault(pr, []).append(w)

        scored = sorted(
            (
                (f / (piece_freq[a] * piece_freq[b]), (a, b))
                for (a, b), f in pair_freq.items()
                if f >= min_pair_freq
            ),
            key=lambda t: (-t[0], t[1]),
        )
        used_pieces: set = set()
        merges = []
        for _, (a, b) in scored:
            if len(merges) >= batch_size or (
                len(vocab) + len(merges) >= vocab_size
            ):
                break
            if a in used_pieces or b in used_pieces:
                continue
            merged = a + b[2:] if b.startswith("##") else a + b
            if merged in vocab_set:
                continue
            used_pieces.update((a, b, merged))
            merges.append((a, b, merged))
        if not merges:
            break

        merge_map = {(a, b): m for a, b, m in merges}
        touched = set()
        for a, b, _ in merges:
            touched.update(index.get((a, b), ()))
        for w in touched:
            pieces = words[w]
            out: List[str] = []
            i = 0
            while i < len(pieces):
                if (
                    i + 1 < len(pieces)
                    and (pieces[i], pieces[i + 1]) in merge_map
                ):
                    out.append(merge_map[(pieces[i], pieces[i + 1])])
                    i += 2
                else:
                    out.append(pieces[i])
                    i += 1
            words[w] = tuple(out)
        for _, _, m in merges:
            vocab.append(m)
            vocab_set.add(m)
    return vocab
