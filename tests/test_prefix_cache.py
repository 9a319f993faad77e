"""Automatic prefix caching on the paged engine: published prompt pages
are shared by later requests with a page-aligned common prefix — outputs
stay identical while the shared prefix skips recompute."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tools.convert_hf_llama import convert_state_dict

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.gpt2 import load_params
from ggml_tpu.models.llama import Llama, config_from_gguf
from ggml_tpu.paged_kv import PagedConfig
from ggml_tpu.serve import Engine


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5, attention_dropout=0.0,
    )
    torch.manual_seed(11)
    hf = transformers.LlamaForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("pfx") / "m.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    g = GGUFFile(path)
    return Llama(load_params(g), config_from_gguf(g), max_seq=64, batch=1)


def _engine(m, prefix_cache: bool):
    return Engine(m, max_batch=2, max_seq=64, cache_dtype=jnp.float32,
                  paged=PagedConfig(page_size=4, n_pages=30,
                                    max_pages_per_seq=16,
                                    prefix_cache=prefix_cache))


def test_prefix_hit_same_output_and_skips_recompute(model):
    rng = np.random.default_rng(3)
    common = [int(x) for x in rng.integers(1, 127, 13)]  # 3 full pages + 1
    tail_a = [5, 9, 33]
    tail_b = [7, 7]

    base = _engine(model, prefix_cache=False)
    r1 = base.submit(common + tail_a, 6)
    r2 = base.submit(common + tail_b, 6)
    want = base.run()

    eng = _engine(model, prefix_cache=True)
    s1 = eng.submit(common + tail_a, 6)
    out1 = eng.run()
    assert eng.cached_prefix_tokens == 0  # nothing published yet
    s2 = eng.submit(common + tail_b, 6)
    out2 = eng.run()
    assert out1[s1] == want[r1]
    assert out2[s2] == want[r2]
    # the second request reused the 3 full common pages (12 tokens)
    assert eng.cached_prefix_tokens == 12


def test_identical_prompt_hits_max_aligned_prefix(model):
    rng = np.random.default_rng(4)
    prompt = [int(x) for x in rng.integers(1, 127, 16)]  # exactly 4 pages

    eng = _engine(model, prefix_cache=True)
    a = eng.submit(prompt, 5)
    first = eng.run()
    b = eng.submit(prompt, 5)
    second = eng.run()
    assert first[a] == second[b]
    # capped at (t-1)//ps pages so >= 1 suffix token yields logits
    assert eng.cached_prefix_tokens == 12


def test_pages_shared_not_duplicated(model):
    rng = np.random.default_rng(5)
    prompt = [int(x) for x in rng.integers(1, 127, 13)]
    eng = _engine(model, prefix_cache=True)
    eng.run() if False else None
    a = eng.submit(prompt, 4)
    eng.run()
    free_after_first = eng.mgr.free_pages()
    b = eng.submit(prompt, 4)
    eng.run()
    # published pages persist in the reclaimable LRU; repeated runs must
    # not leak pool pages
    assert eng.mgr.free_pages() == free_after_first


def test_concurrent_mixed_prefix_requests(model):
    rng = np.random.default_rng(6)
    common = [int(x) for x in rng.integers(1, 127, 9)]  # 2 full pages + 1
    prompts = [common + [3], common + [4, 8], [9, 9, 1]]

    base = _engine(model, prefix_cache=False)
    rids = [base.submit(p, 5) for p in prompts]
    want = base.run()

    eng = _engine(model, prefix_cache=True)
    warm = eng.submit(common + [2], 3)  # publishes the common pages
    eng.run()
    sids = [eng.submit(p, 5) for p in prompts]
    got = eng.run()
    for r, s, p in zip(rids, sids, prompts):
        assert got[s] == want[r], p
    assert eng.cached_prefix_tokens >= 16  # two hits x 8 shared tokens


def test_server_prefix_cache_over_http(model, tmp_path_factory):
    """tools/server.py --prefix-cache: repeated prompts over HTTP reuse
    published pages and return identical greedy completions."""
    import json
    import socket
    import threading
    import urllib.request

    tmp = tmp_path_factory.mktemp("pfx_srv")
    # write the fixture model to its own GGUF for the server to load
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5, attention_dropout=0.0,
    )
    torch.manual_seed(11)
    hf = transformers.LlamaForCausalLM(cfg).eval()
    path = tmp / "srv.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)

    from tools.server import ServerState, serve

    pcfg = PagedConfig(page_size=4, n_pages=40, max_pages_per_seq=16,
                       prefix_cache=True)
    state = ServerState(str(path), max_batch=2, max_seq=64,
                        cache_dtype=jnp.float32, paged=pcfg)
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    httpd = serve(state, "127.0.0.1", port)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        prompt = [3, 14, 15, 92, 65, 35, 89, 79, 32, 38]  # 2 full pages + 2

        def post():
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/v1/completions",
                json.dumps({"prompt": prompt, "max_tokens": 5,
                            "temperature": 0}).encode(),
                {"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=120) as r:
                return json.loads(r.read())["choices"][0]["text"]

        first = post()
        hits0 = state.engine.cached_prefix_tokens
        second = post()
        assert second == first
        assert state.engine.cached_prefix_tokens > hits0
    finally:
        httpd.shutdown()
        state.shutdown()
