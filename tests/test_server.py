"""OpenAI-compatible HTTP server (tools/server.py) over the
continuous-batching engine: greedy == solo, concurrency, streaming,
stop sequences, chat template."""

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

from tools.convert_hf_gpt2 import convert_state_dict

from ggml_tpu.tokenizer import bytes_to_unicode


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    cfg = transformers.GPT2Config(
        vocab_size=256, n_positions=128, n_embd=32, n_layer=2, n_head=4,
        bos_token_id=255, eos_token_id=254,
    )
    torch.manual_seed(11)
    hf = transformers.GPT2LMHeadModel(cfg).eval()
    path = tmp_path_factory.mktemp("server") / "srv.gguf"
    w = convert_state_dict(hf.state_dict(), cfg)
    # byte-level tokenizer: id i <-> byte i (BPE with no merges)
    b2u = bytes_to_unicode()
    w.add_array("tokenizer.ggml.model", ["gpt2"])
    w.add_array("tokenizer.ggml.tokens", [b2u[b] for b in range(256)])
    w.add_array("tokenizer.ggml.merges", [])
    w.add_u32("tokenizer.ggml.eos_token_id", 254)
    w.add_string("tokenizer.chat_template",
                 "{% for m in messages %}<{{ m.role }}>{{ m.content }}"
                 "{% endfor %}{% if add_generation_prompt %}<assistant>"
                 "{% endif %}")
    w.write(path)

    from tools.server import ServerState, serve

    state = ServerState(str(path), max_batch=2, max_seq=96,
                        cache_dtype=jnp.float32)
    port = _free_port()
    httpd = serve(state, "127.0.0.1", port)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield state, f"http://127.0.0.1:{port}", str(path)
    httpd.shutdown()
    state.shutdown()


def _post(base, path, body):
    req = urllib.request.Request(base + path, json.dumps(body).encode(),
                                 {"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def _solo_greedy(gguf, prompt_ids, n):
    from ggml_tpu.models.common import generate
    from ggml_tpu.models.gpt2 import GPT2

    m = GPT2.from_gguf(gguf, max_seq=96, batch=1)
    return generate(m, np.asarray([prompt_ids], np.int32), n,
                    cache_dtype=jnp.float32)


def test_server_health_and_models(server):
    _, base, _ = server
    with urllib.request.urlopen(base + "/health", timeout=30) as r:
        assert json.loads(r.read())["status"] == "ok"
    with urllib.request.urlopen(base + "/v1/models", timeout=30) as r:
        models = json.loads(r.read())
    assert models["data"][0]["id"] == "srv.gguf"


def test_completions_greedy_matches_solo(server):
    state, base, gguf = server
    prompt = [10, 20, 30, 40]
    res = _post(base, "/v1/completions",
                {"prompt": prompt, "max_tokens": 8, "temperature": 0})
    want = _solo_greedy(gguf, prompt, 8)
    want_text = state.decode(want)
    assert res["choices"][0]["text"] == want_text
    assert res["usage"]["prompt_tokens"] == 4


def test_concurrent_requests_interleave(server):
    state, base, gguf = server
    prompts = [[1, 2, 3], [9, 9, 1, 7], [4, 5]]
    results = {}

    def go(i, p):
        results[i] = _post(base, "/v1/completions",
                           {"prompt": p, "max_tokens": 6, "temperature": 0})

    ts = [threading.Thread(target=go, args=(i, p))
          for i, p in enumerate(prompts)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=300)
    for i, p in enumerate(prompts):
        want = state.decode(_solo_greedy(gguf, p, 6))
        assert results[i]["choices"][0]["text"] == want, (p, results[i])


def test_streaming_matches_nonstream(server):
    state, base, _ = server
    body = {"prompt": [5, 6, 7], "max_tokens": 6, "temperature": 0,
            "stream": True}
    req = urllib.request.Request(base + "/v1/completions",
                                 json.dumps(body).encode(),
                                 {"Content-Type": "application/json"})
    deltas, fin = [], None
    with urllib.request.urlopen(req, timeout=120) as r:
        for line in r:
            line = line.decode().strip()
            if not line.startswith("data: "):
                continue
            payload = line[6:]
            if payload == "[DONE]":
                break
            ch = json.loads(payload)["choices"][0]
            deltas.append(ch["text"])
            if ch["finish_reason"]:
                fin = ch["finish_reason"]
    plain = _post(base, "/v1/completions",
                  {"prompt": [5, 6, 7], "max_tokens": 6, "temperature": 0})
    assert "".join(deltas) == plain["choices"][0]["text"]
    assert fin == plain["choices"][0]["finish_reason"]


def test_stop_sequence_truncates(server):
    state, base, gguf = server
    prompt = [10, 20, 30, 40]
    full = _post(base, "/v1/completions",
                 {"prompt": prompt, "max_tokens": 8, "temperature": 0})
    text = full["choices"][0]["text"]
    assert len(text) >= 2
    stop = text[1]  # second generated character
    res = _post(base, "/v1/completions",
                {"prompt": prompt, "max_tokens": 8, "temperature": 0,
                 "stop": stop})
    assert res["choices"][0]["text"] == text[: text.index(stop)]
    assert res["choices"][0]["finish_reason"] == "stop"


def test_chat_endpoint(server):
    state, base, _ = server
    res = _post(base, "/v1/chat/completions",
                {"messages": [{"role": "user", "content": "hi"}],
                 "max_tokens": 4, "temperature": 0})
    msg = res["choices"][0]["message"]
    assert msg["role"] == "assistant" and isinstance(msg["content"], str)


def test_chat_template_renders(server):
    """tokenizer.chat_template from the GGUF drives the chat prompt."""
    state, _, _ = server
    out = state.chat_prompt([{"role": "user", "content": "hi"},
                             {"role": "assistant", "content": "yo"}])
    assert out == "<user>hi<assistant>yo<assistant>"


def test_sampled_request(server):
    _, base, _ = server
    res = _post(base, "/v1/completions",
                {"prompt": [3, 4], "max_tokens": 5, "temperature": 0.8,
                 "top_p": 0.9})
    assert isinstance(res["choices"][0]["text"], str)
    assert res["usage"]["completion_tokens"] >= 1


def test_n_completions_shared_prefill(server):
    """n>1 forks share ONE prefill (Engine.submit_many) and each choice is
    a separate sampled continuation."""
    state, base, _ = server
    before = state.engine.prefill_count
    res = _post(base, "/v1/completions",
                {"prompt": [11, 22, 33, 44], "max_tokens": 5,
                 "temperature": 0.9, "top_p": 0.95, "n": 3})
    assert len(res["choices"]) == 3
    assert [c["index"] for c in res["choices"]] == [0, 1, 2]
    assert all(isinstance(c["text"], str) for c in res["choices"])
    assert state.engine.prefill_count == before + 1  # one shared prefill
    assert res["usage"]["completion_tokens"] >= 3
