"""/v1/embeddings on tools/server.py: a BERT-family GGUF behind the
OpenAI embeddings API alongside the completion engine."""

import json
import socket
import threading
import urllib.request

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_bert import convert_state_dict as convert_bert
from tools.convert_hf_gpt2 import convert_state_dict as convert_gpt2


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("srv_embed")
    lm_cfg = transformers.GPT2Config(vocab_size=256, n_positions=64, n_embd=32,
                                     n_layer=1, n_head=4)
    torch.manual_seed(3)
    lm = transformers.GPT2LMHeadModel(lm_cfg).eval()
    lm_path = tmp / "lm.gguf"
    convert_gpt2(lm.state_dict(), lm_cfg).write(lm_path)

    bert_cfg = transformers.BertConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=64, type_vocab_size=2, layer_norm_eps=1e-12,
        attn_implementation="eager",
    )
    torch.manual_seed(4)
    bert = transformers.BertModel(bert_cfg).eval()
    bert_path = tmp / "embed.gguf"
    convert_bert(bert.state_dict(), bert_cfg).write(bert_path)

    from tools.server import ServerState, serve

    state = ServerState(str(lm_path), max_batch=2, max_seq=48,
                        cache_dtype=jnp.float32, embed_model=str(bert_path))
    port = _free_port()
    httpd = serve(state, "127.0.0.1", port)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    yield state, f"http://127.0.0.1:{port}", bert
    httpd.shutdown()
    state.shutdown()


def _post(base, path, body):
    req = urllib.request.Request(base + path, json.dumps(body).encode(),
                                 {"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_embeddings_endpoint_matches_model(server):
    state, base, bert = server
    ids = [[5, 9, 33, 71], [2, 40, 18]]
    res = _post(base, "/v1/embeddings", {"input": ids})
    assert len(res["data"]) == 2
    vecs = [np.asarray(d["embedding"]) for d in res["data"]]
    # unit-normalized
    for v in vecs:
        assert abs(np.linalg.norm(v) - 1.0) < 1e-5
    # matches HF mean-pooled, normalized embeddings
    for seq, v in zip(ids, vecs):
        with torch.no_grad():
            out = bert(torch.tensor([seq])).last_hidden_state[0].mean(0)
        want = (out / out.norm()).numpy()
        nmse = float(((v - want) ** 2).sum() / (want ** 2).sum())
        assert nmse < 1e-6, nmse


def test_models_lists_embedder(server):
    _, base, _ = server
    with urllib.request.urlopen(base + "/v1/models", timeout=30) as r:
        ids = [m["id"] for m in json.loads(r.read())["data"]]
    assert "lm.gguf" in ids and "embed.gguf" in ids


def test_completions_still_work(server):
    _, base, _ = server
    res = _post(base, "/v1/completions",
                {"prompt": [1, 2, 3], "max_tokens": 4, "temperature": 0})
    assert res["usage"]["completion_tokens"] >= 1
