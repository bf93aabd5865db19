"""Reference-scale vocab drop-in via $EALDM_VOCAB_PATH.

The reference tokenizes txt2img conditioning with HF `bert-base-uncased`
(30,522 tokens, `/root/reference/ldm/modules/encoders/modules.py:57-60`).
The committed compact vocab keeps CI hermetic; a deployment points
EALDM_VOCAB_PATH at a real vocab.txt and every tokenizer construction site
(WordPieceTokenizer, SimpleTokenizer, BERTEmbedder.tokenize) picks it up.
These tests prove the machinery behaves at the reference scale with a
synthetic 30,522-line vocab file.
"""
import jax
import jax.numpy as jnp
import numpy as np

from ealdm_tpu.data.tokenizer import (
    SPECIALS,
    WordPieceTokenizer,
    default_vocab_path,
)

BERT_VOCAB_SIZE = 30522


def _write_bert_scale_vocab(path):
    """Synthetic vocab.txt with bert-base-uncased's shape: specials first,
    then single characters, whole words, and ## continuations out to
    exactly 30,522 lines."""
    toks = list(SPECIALS)
    toks += [chr(c) for c in range(ord("a"), ord("z") + 1)]
    toks += [str(d) for d in range(10)]
    # NB: single characters (incl. "a") are already present from the chr
    # block above; adding them again would dedupe in the vocab dict
    toks += ["bridge", "stone", "dusk", "photo", "of", "the",
             "##s", "##ing", "##ed"]
    i = 0
    while len(toks) < BERT_VOCAB_SIZE:
        toks.append(f"tok{i:05d}")
        i += 1
    with open(path, "w") as f:
        f.write("\n".join(toks) + "\n")
    return toks


def test_wordpiece_at_bert_scale(tmp_path, monkeypatch):
    vocab_file = str(tmp_path / "vocab.txt")
    toks = _write_bert_scale_vocab(vocab_file)
    monkeypatch.setenv("EALDM_VOCAB_PATH", vocab_file)

    assert default_vocab_path() == vocab_file
    tok = WordPieceTokenizer(max_len=16)  # no explicit path: env resolves
    assert len(tok) == BERT_VOCAB_SIZE

    ids = tok.encode("a stone bridge at dusk")
    assert len(ids) <= 16  # [CLS] pieces [SEP], truncated to max_len
    assert ids[0] == tok.cls_id and ids[-1] == tok.sep_id
    # whole-vocab words map to their exact line index
    assert toks.index("stone") in ids
    assert toks.index("bridge") in ids
    assert all(0 <= i < BERT_VOCAB_SIZE for i in ids)
    # continuation merging at scale: "bridges" -> bridge + ##s
    ids2 = tok.encode("bridges")
    assert toks.index("bridge") in ids2 and toks.index("##s") in ids2


def test_bert_embedder_at_reference_scale(tmp_path, monkeypatch):
    """BERTEmbedder built at vocab_size=30522 with the env vocab: the
    embedding table has the reference shape, ids stay in range, max_len
    truncation/padding holds, and the context comes out [B, 77, n_embed]."""
    vocab_file = str(tmp_path / "vocab.txt")
    _write_bert_scale_vocab(vocab_file)
    monkeypatch.setenv("EALDM_VOCAB_PATH", vocab_file)

    from ealdm_tpu.models.encoders import BERTEmbedder

    emb = BERTEmbedder(n_embed=16, n_layer=1, vocab_size=BERT_VOCAB_SIZE)
    variables = emb.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 77), jnp.int32))
    # tokenize is a bound method (setup-held tokenizer), as knn2img uses it
    tokens = emb.bind(variables).tokenize(
        ["a stone bridge at dusk",
         "the " * 200])  # second prompt overflows max_len
    tokens = np.asarray(tokens)
    assert tokens.shape == (2, 77)
    assert tokens.max() < BERT_VOCAB_SIZE and tokens.min() >= 0
    table = variables["params"]["transformer"]["token_emb"]["embedding"]
    assert table.shape[0] == BERT_VOCAB_SIZE
    out = emb.apply(variables, jnp.asarray(tokens))
    assert out.shape == (2, 77, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_simple_tokenizer_env_pickup(tmp_path, monkeypatch):
    from ealdm_tpu.models.text_transformer import SimpleTokenizer

    vocab_file = str(tmp_path / "vocab.txt")
    toks = _write_bert_scale_vocab(vocab_file)
    monkeypatch.setenv("EALDM_VOCAB_PATH", vocab_file)
    st = SimpleTokenizer(BERT_VOCAB_SIZE, max_len=12)
    assert st._wordpiece is not None and len(st._wordpiece) == BERT_VOCAB_SIZE
    ids = np.asarray(st(["a photo of the stone bridge"]))
    assert ids.shape == (1, 12)
    assert toks.index("photo") in ids[0]


def test_simple_tokenizer_env_missing_file_raises(tmp_path, monkeypatch):
    """An explicitly configured vocab that does not exist must fail loudly,
    not silently degrade to the hash-bucket fallback (ids would differ)."""
    import pytest

    from ealdm_tpu.models.text_transformer import SimpleTokenizer

    monkeypatch.setenv("EALDM_VOCAB_PATH", str(tmp_path / "nope.txt"))
    with pytest.raises(FileNotFoundError, match="EALDM_VOCAB_PATH"):
        SimpleTokenizer(BERT_VOCAB_SIZE, max_len=12)
