"""GPT-2 byte-level BPE tokenizer (analog of gpt_tokenize/gpt_vocab,
reference: examples/common.cpp:236-334, and the standard GPT-2 BPE).

Loads vocab + merges from GGUF metadata (tokenizer.ggml.tokens/merges).
"""

from __future__ import annotations

import re
from functools import lru_cache


@lru_cache()
def bytes_to_unicode():
    """Standard GPT-2 byte<->unicode table."""
    bs = list(range(ord("!"), ord("~") + 1)) + list(range(ord("¡"), ord("¬") + 1)) + list(range(ord("®"), ord("ÿ") + 1))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


_PAT = re.compile(r"""'s|'t|'re|'ve|'m|'ll|'d| ?[^\s\w\d]+|\s+(?!\S)|\s+|[\w\d]+""", re.UNICODE)
# GPT-2's exact splitter
_GPT2_PAT = re.compile(r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""") if False else None


class BPETokenizer:
    def __init__(self, tokens: list[str], merges: list[str]):
        self.encoder = {t: i for i, t in enumerate(tokens)}
        self.decoder = dict(enumerate(tokens))
        self.bpe_ranks = {tuple(m.split(" ")): i for i, m in enumerate(merges)}
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self._cache: dict[str, list[str]] = {}

    @classmethod
    def from_gguf(cls, g):
        return cls(list(g.metadata["tokenizer.ggml.tokens"]), list(g.metadata.get("tokenizer.ggml.merges", [])))

    def _bpe(self, token: str) -> list[str]:
        if token in self._cache:
            return self._cache[token]
        word = list(token)
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, 1 << 30))
            if best not in self.bpe_ranks:
                break
            first, second = best
            out = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    out.append(first + second)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            word = out
        self._cache[token] = word
        return word

    def encode(self, text: str) -> list[int]:
        ids = []
        for chunk in _PAT.findall(text):
            chunk = "".join(self.byte_encoder[b] for b in chunk.encode("utf-8"))
            for piece in self._bpe(chunk):
                if piece in self.encoder:
                    ids.append(self.encoder[piece])
        return ids

    def decode(self, ids) -> str:
        text = "".join(self.decoder[int(i)] for i in ids)
        data = bytearray(self.byte_decoder.get(c, ord("?")) for c in text)
        return data.decode("utf-8", errors="replace")
