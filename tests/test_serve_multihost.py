"""Multi-host continuous batching: 2 simulated hosts (CPU devices + gloo
collectives) produce the SAME outputs as a solo single-process Engine.

Each subprocess is one "host": jax.distributed.initialize over localhost,
KV-cache slots sharded across both hosts' devices ('dp'), control decisions
broadcast from the coordinator (ggml_tpu.serve_multihost).  The reference
analog being replaced is the RPC star (src/ggml-rpc/ggml-rpc.cpp) — here the
tensors ride the mesh and only tick decisions ride TCP."""

import json
import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

ROOT = pathlib.Path(__file__).resolve().parent.parent

PROMPTS = [[1, 2, 3], [4, 5], [9, 9, 1, 7], [3, 3], [8, 2, 6]]
MAX_NEW = 6

_WORKER = r"""
import json, sys
import jax
jax.config.update("jax_cpu_collectives_implementation", "gloo")
pid = int(sys.argv[1])
gguf_path = sys.argv[2]
port1, port2 = int(sys.argv[3]), int(sys.argv[4])
jax.distributed.initialize(f"localhost:{port1}", num_processes=2, process_id=pid)
sys.path.insert(0, ".")
import jax.numpy as jnp
import numpy as np
from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.gpt2 import load_params
from ggml_tpu.models.llama import Llama, config_from_gguf
from ggml_tpu.serve_multihost import ControlChannel, make_multihost_engine

g = GGUFFile(gguf_path)
m = Llama(load_params(g), config_from_gguf(g), max_seq=64, batch=1)
ch = ControlChannel(is_coord=(pid == 0), n_workers=1, port=port2)
eng = make_multihost_engine(m, ch, max_batch=4, max_seq=64, cache_dtype=jnp.float32)
assert jax.process_count() == 2, jax.process_count()

prompts = PROMPTS_PLACEHOLDER
if pid == 0:
    rids = [eng.submit(p, MAX_NEW_PLACEHOLDER) for p in prompts]
res = eng.run()
ch.close()
print("RESULT" + str(pid) + " " + json.dumps({str(k): v for k, v in sorted(res.items())}), flush=True)
"""


def _tiny_llama_gguf(tmp):
    from tools.convert_hf_llama import convert_state_dict

    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4, max_position_embeddings=128,
        rms_norm_eps=1e-5, attention_dropout=0.0,
    )
    torch.manual_seed(41)
    hf = transformers.LlamaForCausalLM(cfg).eval()
    path = tmp / "mh.gguf"
    convert_state_dict(hf.state_dict(), cfg).write(path)
    return path


def test_multihost_engine_matches_solo(tmp_path):
    path = _tiny_llama_gguf(tmp_path)

    # solo ground truth in this process (single host, plain Engine)
    import jax.numpy as jnp

    from ggml_tpu.gguf import GGUFFile
    from ggml_tpu.models.gpt2 import load_params
    from ggml_tpu.models.llama import Llama, config_from_gguf
    from ggml_tpu.serve import Engine

    g = GGUFFile(str(path))
    m = Llama(load_params(g), config_from_gguf(g), max_seq=64, batch=1)
    solo = {}
    for p in PROMPTS:
        eng = Engine(m, max_batch=1, max_seq=64, cache_dtype=jnp.float32)
        rid = eng.submit(p, MAX_NEW)
        solo[tuple(p)] = eng.run()[rid]

    # two simulated hosts
    script = (_WORKER
              .replace("PROMPTS_PLACEHOLDER", repr(PROMPTS))
              .replace("MAX_NEW_PLACEHOLDER", str(MAX_NEW)))
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    import socket

    def free_port():
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        p = s.getsockname()[1]
        s.close()
        return p

    port1, port2 = free_port(), free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(i), str(path), str(port1), str(port2)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=ROOT,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        so, se = p.communicate(timeout=600)
        assert p.returncode == 0, f"stdout:\n{so}\nstderr:\n{se[-4000:]}"
        outs.append(so)

    results = {}
    for i, so in enumerate(outs):
        line = [l for l in so.splitlines() if l.startswith(f"RESULT{i} ")][0]
        results[i] = json.loads(line[len(f"RESULT{i} "):])

    # every host reports the same results (replicated control state)
    assert results[0] == results[1]
    # interleaved multi-host outputs == solo single-host outputs
    got = {tuple(p): results[0][str(rid)] for rid, p in enumerate(PROMPTS, start=1)}
    for p in PROMPTS:
        assert got[tuple(p)] == solo[tuple(p)], (p, got[tuple(p)], solo[tuple(p)])


_WORKER_TPDP = r"""
import json, sys
import jax
jax.config.update("jax_cpu_collectives_implementation", "gloo")
pid = int(sys.argv[1])
port1, port2 = int(sys.argv[2]), int(sys.argv[3])
jax.distributed.initialize(f"localhost:{port1}", num_processes=2, process_id=pid)
sys.path.insert(0, ".")
import jax.numpy as jnp
import numpy as np
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.models.gptj import GPTJConfig, synth_quantized_params
from ggml_tpu.serve_multihost import ControlChannel, make_multihost_engine

cfg = GPTJConfig(n_vocab=512, n_ctx=64, n_embd=512, n_head=8, n_layer=2, n_rot=32)
params = synth_quantized_params(cfg, GGMLType.Q4_K, seed=3, dtype=jnp.float32,
                                fuse_qkv=False, use_q4=True)

class TPModel:
    pass
m = TPModel()
m.params = params
m.cfg = cfg

ch = ControlChannel(is_coord=(pid == 0), n_workers=1, port=port2)
# 2 hosts x 2 devices: dp=2 across hosts, tp=2 within each host
eng = make_multihost_engine(m, ch, tp=2, max_batch=4, max_seq=48,
                            cache_dtype=jnp.float32)
assert eng.mesh.shape == {"dp": 2, "tp": 2}, eng.mesh.shape

prompts = PROMPTS_PLACEHOLDER
if pid == 0:
    rids = [eng.submit(p, MAX_NEW_PLACEHOLDER) for p in prompts]
res = eng.run()
ch.close()
print("RESULT" + str(pid) + " " + json.dumps({str(k): v for k, v in sorted(res.items())}), flush=True)
"""

_SOLO_TP = r"""
import json, sys
sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from ggml_tpu.dtypes import GGMLType
from ggml_tpu.models.gptj import GPTJConfig, synth_quantized_params
from ggml_tpu.parallel.tp_inference import (
    CACHE_SPEC, make_tp_engine_forward, shard_gptj_params,
)
from ggml_tpu.serve import Engine

cfg = GPTJConfig(n_vocab=512, n_ctx=64, n_embd=512, n_head=8, n_layer=2, n_rot=32)
params = synth_quantized_params(cfg, GGMLType.Q4_K, seed=3, dtype=jnp.float32,
                                fuse_qkv=False, use_q4=True)
mesh = Mesh(np.array(jax.devices()).reshape(1, 2), ("dp", "tp"))
params_tp = shard_gptj_params(params, mesh)

class TPModel:
    pass
m = TPModel()
m.params = params_tp
m.cfg = cfg

fwd = make_tp_engine_forward(cfg, mesh)
put = lambda c: jax.device_put(c, NamedSharding(mesh, CACHE_SPEC))
solo = {}
for p in PROMPTS_PLACEHOLDER:
    eng = Engine(m, max_batch=1, max_seq=48, cache_dtype=jnp.float32,
                 forward_fn=fwd, cache_put=put)
    rid = eng.submit(p, MAX_NEW_PLACEHOLDER)
    solo[json.dumps(p)] = eng.run()[rid]
print("SOLO " + json.dumps(solo), flush=True)
"""


def test_multihost_tp_dp_composition(tmp_path):
    """tp x dp multi-host serving: 2 hosts x 2 devices, KV slots sharded over
    'dp' (across hosts) AND weights/heads tensor-parallel over 'tp' (within
    each host) on a packed-q4 GPT-J — outputs equal a single-process tp=2
    engine's solo runs (same tp width => identical shard numerics)."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    prompts = [[1, 2, 3], [4, 5], [9, 9, 1, 7], [3, 3], [8, 2, 6]]
    max_new = 6

    solo_script = (_SOLO_TP
                   .replace("PROMPTS_PLACEHOLDER", repr(prompts))
                   .replace("MAX_NEW_PLACEHOLDER", str(max_new)))
    r = subprocess.run([sys.executable, "-c", solo_script], capture_output=True,
                       text=True, env=env, cwd=ROOT, timeout=600)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr[-4000:]}"
    solo = json.loads([l for l in r.stdout.splitlines() if l.startswith("SOLO ")][0][5:])

    script = (_WORKER_TPDP
              .replace("PROMPTS_PLACEHOLDER", repr(prompts))
              .replace("MAX_NEW_PLACEHOLDER", str(max_new)))

    import socket

    def free_port():
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        p = s.getsockname()[1]
        s.close()
        return p

    port1, port2 = free_port(), free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(i), str(port1), str(port2)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=ROOT,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        so, se = p.communicate(timeout=600)
        assert p.returncode == 0, f"stdout:\n{so}\nstderr:\n{se[-4000:]}"
        outs.append(so)

    results = {}
    for i, so in enumerate(outs):
        line = [l for l in so.splitlines() if l.startswith(f"RESULT{i} ")][0]
        results[i] = json.loads(line[len(f"RESULT{i} "):])
    assert results[0] == results[1]
    got = {json.dumps(p): results[0][str(rid)] for rid, p in enumerate(prompts, start=1)}
    for p in prompts:
        key = json.dumps(p)
        assert got[key] == solo[key], (p, got[key], solo[key])


_WORKER_PREEMPT = r"""
import json, sys
import jax
jax.config.update("jax_cpu_collectives_implementation", "gloo")
pid = int(sys.argv[1])
gguf_path = sys.argv[2]
port1, port2 = int(sys.argv[3]), int(sys.argv[4])
jax.distributed.initialize(f"localhost:{port1}", num_processes=2, process_id=pid)
sys.path.insert(0, ".")
import jax.numpy as jnp
import numpy as np
from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.gpt2 import load_params
from ggml_tpu.models.llama import Llama, config_from_gguf
from ggml_tpu.serve_multihost import ControlChannel, make_multihost_engine

g = GGUFFile(gguf_path)
m = Llama(load_params(g), config_from_gguf(g), max_seq=64, batch=1)
ch = ControlChannel(is_coord=(pid == 0), n_workers=1, port=port2)
eng = make_multihost_engine(m, ch, max_batch=2, max_seq=64, cache_dtype=jnp.float32)

if pid == 0:
    # the urgent request arrives mid-run (from a streaming callback) so both
    # low-priority requests already occupy the 2 slots when it lands; every
    # tick stays inside run()'s broadcast protocol (all hosts tick in
    # lockstep — a coordinator-only tick would deadlock the collectives)
    state = {"n": 0, "sub": False}
    def on_tok(rid, tok, done):
        state["n"] += 1
        if state["n"] == 2 and not state["sub"]:
            state["sub"] = True
            eng.submit([9, 9, 1], 8, priority=0)
    eng.submit([1, 2, 3], 8, priority=5, on_token=on_tok)
    eng.submit([4, 5], 8, priority=5)
res = eng.run()
ch.close()
print("RESULT" + str(pid) + " " + json.dumps({str(k): v for k, v in sorted(res.items())})
      + " PREFILLS " + str(eng.prefill_count), flush=True)
"""


def test_multihost_preemption_snapshots_across_hosts(tmp_path):
    """Priority preemption on the sharded-slot engine: the evicted slot's KV
    is gathered to a replicated snapshot (a jitted SPMD program — no side
    channel), resume restores it on both hosts, outputs stay lossless and
    prefill runs once per request ON THE COORDINATOR (workers only prefill
    what they admit; the preempted request must NOT re-prefill)."""
    path = _tiny_llama_gguf(tmp_path)

    import jax.numpy as jnp

    from ggml_tpu.gguf import GGUFFile
    from ggml_tpu.models.gpt2 import load_params
    from ggml_tpu.models.llama import Llama, config_from_gguf
    from ggml_tpu.serve import Engine

    g = GGUFFile(str(path))
    m = Llama(load_params(g), config_from_gguf(g), max_seq=64, batch=1)
    solo = {}
    for p in ([1, 2, 3], [4, 5], [9, 9, 1]):
        eng = Engine(m, max_batch=1, max_seq=64, cache_dtype=jnp.float32)
        rid = eng.submit(p, 8)
        solo[tuple(p)] = eng.run()[rid]

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    # one device per host: 2 global devices = 2 slots, forcing preemption
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

    import socket

    def free_port():
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        p = s.getsockname()[1]
        s.close()
        return p

    port1, port2 = free_port(), free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER_PREEMPT, str(i), str(path), str(port1), str(port2)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env, cwd=ROOT,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        so, se = p.communicate(timeout=600)
        assert p.returncode == 0, f"stdout:\n{so}\nstderr:\n{se[-4000:]}"
        outs.append(so)

    line0 = [l for l in outs[0].splitlines() if l.startswith("RESULT0 ")][0]
    body, prefills = line0[len("RESULT0 "):].split(" PREFILLS ")
    res = json.loads(body)
    assert res["1"] == solo[(1, 2, 3)]
    assert res["2"] == solo[(4, 5)]
    assert res["3"] == solo[(9, 9, 1)]
    # snapshot resume: 3 requests, 3 coordinator prefills (no re-prefill)
    assert int(prefills) == 3, prefills
