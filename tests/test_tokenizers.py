import numpy as np
import pytest

from hirest_tpu.tokenizers import ClipBPETokenizer, WordPieceTokenizer, clip_tokenize
from hirest_tpu.tokenizers.wordpiece import detokenize_caption


# ---------------------------------------------------------------------------
# CLIP BPE
# ---------------------------------------------------------------------------


def test_bpe_vocab_size():
    tok = ClipBPETokenizer()
    assert tok.vocab_size == 49408
    assert tok.encoder["<|startoftext|>"] == 49406
    assert tok.encoder["<|endoftext|>"] == 49407


def test_bpe_known_token_ids():
    # "a photo of a cat" has well-known CLIP token ids (public vocab):
    tok = ClipBPETokenizer()
    ids = tok.encode("a photo of a cat")
    assert ids == [320, 1125, 539, 320, 2368]


def test_bpe_roundtrip():
    tok = ClipBPETokenizer()
    text = "make oatmeal pancake mix"
    ids = tok.encode(text)
    assert tok.decode(ids).strip() == text


def test_clip_tokenize_shape_and_layout():
    arr = clip_tokenize(["hello world", "a"])
    assert arr.shape == (2, 77)
    assert arr.dtype == np.int32
    assert arr[0, 0] == 49406
    # EOT is the max id in each row (the text tower pools at argmax)
    assert arr[0].max() == 49407
    assert arr[1, 2] == 49407 and arr[1, 3] == 0


def test_clip_tokenize_truncation():
    long_text = "word " * 200
    with pytest.raises(RuntimeError):
        clip_tokenize(long_text)
    arr = clip_tokenize(long_text, truncate=True)
    assert arr.shape == (1, 77)
    assert arr[0, -1] == 49407


# ---------------------------------------------------------------------------
# WordPiece
# ---------------------------------------------------------------------------

TINY_VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
              "add", "salt", "and", "water", "mix", "##ing", "##ed", "pan",
              "##cake", "oat", "##meal", ",", "."]


@pytest.fixture()
def wp(tmp_path):
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(TINY_VOCAB) + "\n")
    return WordPieceTokenizer(str(vocab_file))


def test_wordpiece_greedy_longest_match(wp):
    assert wp.tokenize("oatmeal pancake") == ["oat", "##meal", "pan", "##cake"]
    assert wp.tokenize("Add salt, and water.") == ["add", "salt", ",", "and", "water", "."]


def test_wordpiece_unknown(wp):
    assert wp.tokenize("zzzqqq") == ["[UNK]"]


def test_wordpiece_ids_roundtrip(wp):
    toks = wp.tokenize("mixing salt")
    ids = wp.convert_tokens_to_ids(toks)
    assert wp.convert_ids_to_tokens(ids) == toks


def test_detokenize_caption_matches_reference_postprocess():
    toks = ["add", "salt", "and", "oat", "##meal", "[SEP]", "junk"]
    assert detokenize_caption(toks) == "add salt and oatmeal"
    toks = ["pan", "##cake", "[PAD]", "x"]
    assert detokenize_caption(toks) == "pancake"
    # leading continuation is stripped like the reference's strip("##")
    assert detokenize_caption(["##ing", "salt"]) == "ing salt"


def test_clip_bpe_underscore_not_dropped():
    """'_' must tokenize as punctuation (reference CLIP's [^\\s\\p{L}\\p{N}]+
    branch), not vanish from the word-split regex: 'foo_bar' encodes to
    foo / _ / bar, never to the ids of plain 'foo bar'."""
    from hirest_tpu.tokenizers.bpe import ClipBPETokenizer

    t = ClipBPETokenizer()
    with_us = t.encode("foo_bar")
    without = t.encode("foo bar")
    assert with_us != without
    assert t.decode(with_us) == "foo _ bar "
