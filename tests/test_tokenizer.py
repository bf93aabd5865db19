"""WordPiece tokenizer: HF algorithm parity, determinism, trainer."""
import numpy as np
import pytest

from ealdm_tpu.data.tokenizer import (
    DEFAULT_VOCAB_PATH,
    WordPieceTokenizer,
    basic_tokenize,
    save_vocab,
    train_wordpiece,
)

SENTENCES = [
    "A river flowing under a bridge in winter snow.",
    "heavy rain and thunder over the forest, water level rising!",
    "Sunny morning; clear sky, ice melting on the stream bank.",
    "Überfluß!! naïve café — weird unicode: 你好 world",
    "floods, flooded, flooding... unseen-word-xyzzyq",
    "",
]


def test_hf_bert_tokenizer_parity_on_committed_vocab():
    """Exact id parity with transformers.BertTokenizer running on the SAME
    vocab file — proves the algorithm matches HF bert-base-uncased semantics
    (reference encoders/modules.py:57-60) independent of vocab content."""
    transformers = pytest.importorskip("transformers")
    hf = transformers.BertTokenizer(
        DEFAULT_VOCAB_PATH, do_lower_case=True, model_max_length=77
    )
    ours = WordPieceTokenizer(DEFAULT_VOCAB_PATH, max_len=77)
    for s in SENTENCES:
        ref = hf.encode(s, truncation=True, max_length=77)
        got = ours.encode(s)
        assert got == ref, (s, got, ref)


def test_known_words_get_stable_distinct_ids():
    tok = WordPieceTokenizer(DEFAULT_VOCAB_PATH)
    a = tok.encode("river")
    b = tok.encode("river")
    c = tok.encode("snow")
    assert a == b
    assert a != c
    assert tok.unk_id not in a[1:-1]  # in-vocab word, no UNK


def test_subword_fallback_and_unk():
    tok = WordPieceTokenizer(DEFAULT_VOCAB_PATH)
    pieces = tok.tokenize("riverbanks")  # not in vocab whole -> subwords
    assert len(pieces) >= 2
    assert all(p in tok.vocab for p in pieces)
    assert tok.tokenize("你") == ["[UNK]"]  # CJK char not in vocab


def test_batch_padding_shape():
    tok = WordPieceTokenizer(DEFAULT_VOCAB_PATH, max_len=16)
    out = np.asarray(tok(["rain", "a very long sentence about rivers and snow"]))
    assert out.shape == (2, 16)
    assert out[0, 0] == tok.cls_id
    assert tok.pad_id in out[0]


def test_basic_tokenize_matches_bert_conventions():
    assert basic_tokenize("Hello, World!") == ["hello", ",", "world", "!"]
    assert basic_tokenize("naïve") == ["naive"]  # accent strip
    assert basic_tokenize("a你b") == ["a", "你", "b"]  # CJK isolation


def test_trainer_covers_corpus(tmp_path):
    corpus = [
        "the river flows fast", "the river floods", "flowing rivers flood",
        "fast flowing water", "water floods the river bank",
    ] * 3
    vocab = train_wordpiece(corpus, vocab_size=80)
    path = str(tmp_path / "vocab.txt")
    save_vocab(vocab, path)
    tok = WordPieceTokenizer(path)
    for line in corpus:
        ids = tok.encode(line)
        assert tok.unk_id not in ids, (line, tok.tokenize(line))


def test_simple_tokenizer_uses_wordpiece():
    from ealdm_tpu.models.text_transformer import SimpleTokenizer

    tok = SimpleTokenizer(vocab_size=30522, max_len=32)
    assert tok._wordpiece is not None
    wp = WordPieceTokenizer(DEFAULT_VOCAB_PATH, max_len=32)
    assert tok.encode("snow on the bridge") == wp.encode("snow on the bridge")
    ids = np.asarray(tok(["snow on the bridge"]))
    assert ids.max() < 30522
