"""SPM tokenizer: greedy best-score merges + byte fallback round trip."""

import numpy as np

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
