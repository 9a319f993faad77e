"""End-to-end parity vs the reference BINARY — the Δppl north-star gate.

One tiny random-weight GPT-2 GGUF is evaluated by BOTH stacks on the same
token stream:
- reference side: `.ref_build/ref_gpt2_eval` (tools/ref_gpt2_eval.c), the
  reference library's GGUF loader + graph build (the op sequence of
  examples/gpt-2/main-backend.cpp:444-720) + CPU backend compute;
- our side: GGUF load -> planar repack -> kernels -> logits through
  models/gpt2.forward.

Gates (per VERDICT/BASELINE): per-token logits NMSE <= 5e-4 (the reference's
own matmul-class tolerance, tests/test-backend-ops.cpp:319-321,1915) and
|Δppl| <= 0.01 at F32, Q8_0 and Q4_K.  Note the two stacks do NOT share a
matmul: the reference quantizes activations to q8 and integer-dots
(src/ggml-cpu/ggml-cpu.c:7428), ours dequant-fuses in bf16/f32 — agreement
here is evidence of numerical parity, not shared code.
"""

import pathlib
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

REF_TOOL = pathlib.Path(__file__).resolve().parent.parent / ".ref_build" / "ref_gpt2_eval"

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from ggml_tpu.dtypes import GGMLType
from ggml_tpu.models.gpt2 import GPT2, forward as gpt2_forward, init_cache

pytestmark = pytest.mark.skipif(not REF_TOOL.exists(), reason="reference build not present")

# E=256 so every 2-D weight hits the quantizable in-dim (one Q4_K/Q8_0
# superblock row = 256 elems) and the planar q4 path tiles legally (K/2=128)
N_VOCAB, N_EMBD, N_HEAD, N_LAYER, N_POS = 512, 256, 4, 2, 128
TOKENS = list((np.arange(48) * 37 + 11) % N_VOCAB)


def _make_gguf(tmp, ftype: GGMLType) -> pathlib.Path:
    from tools.convert_hf_gpt2 import convert_state_dict

    cfg = transformers.GPT2Config(
        vocab_size=N_VOCAB, n_positions=N_POS, n_embd=N_EMBD,
        n_layer=N_LAYER, n_head=N_HEAD,
    )
    torch.manual_seed(7)
    hf = transformers.GPT2LMHeadModel(cfg).eval()
    path = tmp / f"e2e_{ftype.name}.gguf"
    convert_state_dict(hf.state_dict(), cfg, ftype=ftype).write(path)
    return path


def _ref_logits(path) -> np.ndarray:
    out = path.parent / (path.stem + ".logits")
    subprocess.run(
        [str(REF_TOOL), str(path), str(out)] + [str(t) for t in TOKENS],
        check=True, capture_output=True,
    )
    raw = out.read_bytes()
    n, v = np.frombuffer(raw, np.uint32, 2)
    return np.frombuffer(raw, np.float32, offset=8).reshape(n, v)


def _our_logits(path) -> np.ndarray:
    m = GPT2.from_gguf(str(path), dtype=jnp.float32, keep_quantized=True,
                       max_seq=len(TOKENS) + 1, batch=1)
    cache = m.new_cache(jnp.float32)
    toks = jnp.asarray(np.asarray(TOKENS, np.int32)[None, :])
    logits, _ = gpt2_forward(m.params, m.cfg, toks, jnp.zeros((1,), jnp.int32),
                             cache, jnp.int32(0))
    return np.asarray(logits[0], np.float32)


def _ppl(logits: np.ndarray) -> float:
    lg = logits.astype(np.float64)
    lg = lg - lg.max(-1, keepdims=True)
    logp = lg - np.log(np.exp(lg).sum(-1, keepdims=True))
    nll = -logp[np.arange(len(TOKENS) - 1), TOKENS[1:]]
    return float(np.exp(nll.mean()))


@pytest.mark.parametrize("ftype", [GGMLType.F32, GGMLType.Q8_0, GGMLType.Q4_K])
def test_reference_e2e_parity(ftype, tmp_path):
    path = _make_gguf(tmp_path, ftype)
    ref = _ref_logits(path)
    ours = _our_logits(path)
    assert ref.shape == ours.shape == (len(TOKENS), N_VOCAB)

    # per-token NMSE against the reference binary's logits
    for i in range(len(TOKENS)):
        num = float(((ours[i] - ref[i]) ** 2).mean())
        den = float((ref[i] ** 2).mean()) + 1e-12
        assert num / den <= 5e-4, f"{ftype.name} token {i}: NMSE {num/den:.2e}"

    dppl = abs(_ppl(ours) - _ppl(ref))
    assert dppl <= 0.01, f"{ftype.name}: |Δppl| = {dppl:.4f}"
