"""GBNF grammar-constrained sampling (the llama.cpp grammars analog):
parser + pushdown matcher semantics, and constrained generation."""

import numpy as np
import pytest

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from ggml_tpu.grammar import GrammarSampler, GrammarState, parse_gbnf


def _accepts(gbnf: str, text: str, complete: bool = True) -> bool:
    st = GrammarState(parse_gbnf(gbnf)).accepts_text(text)
    if st is None:
        return False
    return st.can_end if complete else True


def test_literals_and_alternation():
    g = 'root ::= "yes" | "no"'
    assert _accepts(g, "yes") and _accepts(g, "no")
    assert not _accepts(g, "maybe")
    assert not _accepts(g, "ye")  # prefix: not complete
    assert _accepts(g, "ye", complete=False)  # but still viable


def test_char_classes_and_repetition():
    g = "root ::= [1-9] [0-9]*"
    assert _accepts(g, "7") and _accepts(g, "1024")
    assert not _accepts(g, "0123")
    g2 = 'root ::= "a"+ "b"?'
    assert _accepts(g2, "a") and _accepts(g2, "aaab")
    assert not _accepts(g2, "b") and not _accepts(g2, "abb")


def test_groups_refs_and_escapes():
    g = r'''
    root ::= pair ("," pair)*
    pair ::= key "=" value
    key  ::= [a-z]+
    value ::= [0-9]+ | "\"" [a-z]* "\""
    '''
    assert _accepts(g, "x=1")
    assert _accepts(g, 'x=1,yz="abc"')
    assert not _accepts(g, "x=1,")
    assert not _accepts(g, "X=1")
    g2 = r'root ::= "\n" [^\n]+'
    assert _accepts(g2, "\nhello")
    assert not _accepts(g2, "\n")


def test_negated_class_and_unicode_escape():
    g = r'root ::= [^ab] "A"'
    assert _accepts(g, "cA")
    assert not _accepts(g, "aA")


class _ByteTok:
    """id i <-> chr(i) toy tokenizer."""

    def decode(self, ids):
        return "".join(chr(i) for i in ids)


def test_grammar_sampler_masks_logits():
    tok = _ByteTok()
    s = GrammarSampler('root ::= "hi" | "ho"', tok, eos_id=0)
    rng = np.random.default_rng(0)
    lg = rng.normal(size=(1, 128)).astype(np.float32)
    lg[0, ord("z")] = 100.0  # inadmissible argmax must be skipped
    t1, _ = s(lg)
    assert chr(int(t1[0])) == "h"
    lg2 = rng.normal(size=(1, 128)).astype(np.float32)
    lg2[0, 0] = 100.0  # EOS not admissible mid-grammar
    t2, _ = s(lg2)
    assert chr(int(t2[0])) in "io"
    lg3 = rng.normal(size=(1, 128)).astype(np.float32)
    lg3[0, 0] = 100.0  # now complete: EOS admissible
    t3, _ = s(lg3)
    assert int(t3[0]) == 0


def test_constrained_generation_three_digits(tmp_path):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    import jax.numpy as jnp

    from tools.convert_hf_gpt2 import convert_state_dict

    from ggml_tpu.gguf import GGUFFile
    from ggml_tpu.models.common import generate
    from ggml_tpu.models.gpt2 import GPT2
    from ggml_tpu.tokenizer import BPETokenizer, bytes_to_unicode

    cfg = transformers.GPT2Config(vocab_size=256, n_positions=64, n_embd=32,
                                  n_layer=1, n_head=4)
    torch.manual_seed(9)
    hf = transformers.GPT2LMHeadModel(cfg).eval()
    w = convert_state_dict(hf.state_dict(), cfg)
    b2u = bytes_to_unicode()
    w.add_array("tokenizer.ggml.tokens", [b2u[b] for b in range(256)])
    w.add_array("tokenizer.ggml.merges", [])
    path = tmp_path / "g.gguf"
    w.write(path)

    g = GGUFFile(path)
    tok = BPETokenizer.from_gguf(g)
    m = GPT2.from_gguf(str(path), max_seq=32, batch=1)
    sampler = GrammarSampler("root ::= [1-9] [0-9] [0-9]", tok, eos_id=254)
    out = generate(m, np.asarray([tok.encode("num: ")], np.int32), 5,
                   sampler=sampler, cache_dtype=jnp.float32)
    text = tok.decode(out)
    import re

    assert re.match(r"^[1-9][0-9][0-9]", text), text
    # after completion only EOS is admissible
    assert out[3] == 254 and out[4] == 254
