"""SPM tokenizer: greedy best-score merges + byte fallback round trip."""

import numpy as np
import pytest

from ggml_tpu.tokenizer import SPMTokenizer


def _toy():
    # vocab: singles + merged pieces with scores favoring bigger merges
    toks = ["<unk>", "<s>", "</s>"]
    toks += [f"<0x{b:02X}>" for b in range(256)]
    base = len(toks)
    # full merge chain: greedy SPM can only reach pieces whose intermediate
    # merges all exist in the vocab
    vocab = ["▁", "h", "e", "l", "o", "▁h", "▁he", "▁hel", "▁hell", "▁hello"]
    scores = [0.0] * base + [-10, -10, -10, -10, -10, -5, -4, -3, -2, -1]
    return SPMTokenizer(toks + vocab, scores, bos_id=1)


def test_spm_greedy_merge():
    t = _toy()
    ids = t.encode("hello", add_bos=True)
    assert ids[0] == 1  # bos
    # best-score merge chain should reach the whole-word piece
    assert t.tokens[ids[1]] == "▁hello"
    assert t.decode(ids[1:]) == "hello"


def test_spm_byte_fallback_roundtrip():
    t = _toy()
    ids = t.encode("hé", add_bos=False)  # é not in vocab -> byte tokens
    assert t.decode(ids) == "hé"


class TestWPM:
    """WordPiece (BERT) tokenizer — llm_tokenizer_wpm analog."""

    VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "un", "##aff", "##able",
             "hello", "world", "##d", "##ing", "play", ",", "!", "the"]

    def _tok(self):
        from ggml_tpu.tokenizer import WPMTokenizer

        return WPMTokenizer(self.VOCAB)

    def test_greedy_longest_match(self):
        t = self._tok()
        ids = t.encode("unaffable", add_special=False)
        assert [t.tokens[i] for i in ids] == ["un", "##aff", "##able"]

    def test_special_tokens_and_punct(self):
        t = self._tok()
        ids = t.encode("Hello, world!")
        assert [t.tokens[i] for i in ids] == [
            "[CLS]", "hello", ",", "world", "!", "[SEP]"]

    def test_unk_whole_word(self):
        t = self._tok()
        ids = t.encode("hello qzx", add_special=False)
        assert [t.tokens[i] for i in ids] == ["hello", "[UNK]"]

    def test_continuation_and_decode(self):
        t = self._tok()
        ids = t.encode("playing the world", add_special=True)
        assert [t.tokens[i] for i in ids] == [
            "[CLS]", "play", "##ing", "the", "world", "[SEP]"]
        assert t.decode(ids) == "playing the world"

    def test_matches_hf_bert_tokenizer(self, tmp_path):
        transformers = pytest.importorskip("transformers")
        vocab = tmp_path / "vocab.txt"
        vocab.write_text("\n".join(self.VOCAB) + "\n")
        hf = transformers.BertTokenizer(str(vocab))
        t = self._tok()
        for text in ("unaffable", "Hello, world!", "playing the unaffable world",
                     "qzx hello!!"):
            assert t.encode(text) == hf.encode(text), text
