"""Real-model CI smoke (the reference ci/run.sh gpt-2 integration-stage
analog, reference ci/run.sh:157 — but egress-free): build a tiny Llama GGUF
from a random HF init, quantize it to Q4_K with the streaming converter,
launch tools/server.py as a REAL subprocess, drive 3 concurrent HTTP
completions, and check greedy == solo."""

import json
import pathlib
import socket
import subprocess
import sys
import threading
import time
import urllib.request

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from ggml_tpu.tokenizer import bytes_to_unicode


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


@pytest.fixture(scope="module")
def q4k_llama_gguf(tmp_path_factory):
    from tools.convert_hf_llama import convert_state_dict
    from tools.quantize_gguf import quantize_gguf
    from ggml_tpu.dtypes import GGMLType

    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, bos_token_id=255, eos_token_id=254,
        tie_word_embeddings=False,
    )
    torch.manual_seed(21)
    hf = transformers.LlamaForCausalLM(cfg).eval()
    tmp = tmp_path_factory.mktemp("smoke")
    f32 = tmp / "tiny_llama.gguf"
    w = convert_state_dict(hf.state_dict(), cfg)
    b2u = bytes_to_unicode()
    w.add_array("tokenizer.ggml.model", ["gpt2"])
    w.add_array("tokenizer.ggml.tokens", [b2u[b] for b in range(256)])
    w.add_array("tokenizer.ggml.merges", [])
    w.add_u32("tokenizer.ggml.eos_token_id", 254)
    w.write(f32)

    q4k = tmp / "tiny_llama.q4k.gguf"
    quantize_gguf(str(f32), str(q4k), GGMLType.Q4_K, verbose=False)
    return q4k


def _post(port, prompt, max_tokens=12):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/completions",
        data=json.dumps({"prompt": prompt, "max_tokens": max_tokens,
                         "temperature": 0.0}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())["choices"][0]["text"]


def test_quantized_llama_server_subprocess(q4k_llama_gguf):
    port = _free_port()
    env = dict(__import__("os").environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.Popen(
        [sys.executable, "tools/server.py", str(q4k_llama_gguf),
         "--port", str(port), "--max-batch", "4", "--max-seq", "96"],
        cwd=str(pathlib.Path(__file__).resolve().parent.parent),
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        deadline = time.time() + 300
        while time.time() < deadline:
            try:
                _post(port, "ab", max_tokens=1)
                break
            except Exception:
                if proc.poll() is not None:
                    raise RuntimeError(f"server died:\n{proc.stdout.read()[-2000:]}")
                time.sleep(1.0)
        else:
            raise TimeoutError("server did not come up")

        prompts = ["hello", "quick brown", "abcd"]
        solo = [_post(port, p) for p in prompts]

        got = [None] * 3
        errs = []

        def run(i):
            try:
                got[i] = _post(port, prompts[i])
            except Exception as e:  # surface thread failures in the assert
                errs.append(e)

        threads = [threading.Thread(target=run, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not errs, errs
        # greedy continuous batching must emit the same tokens as solo runs
        assert got == solo, (got, solo)
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()
