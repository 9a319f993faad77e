"""Text-generation CLI — the analog of the reference's gpt-2/gpt-j example
binaries (examples/gpt-2/main-backend.cpp:784 main; flags mirror
examples/common.cpp gpt_params).

Usage:
  python tools/generate.py model.gguf -p "Hello" -n 64 --top-k 40 --top-p 0.95 --temp 0.8
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("-p", "--prompt", default="Hello")
    ap.add_argument("-n", "--n-predict", type=int, default=64)
    ap.add_argument("--arch", choices=["gpt2", "gptj", "llama", "qwen2", "qwen3",
                                       "qwen2moe", "qwen3moe", "deepseek2",
                                       "gemma2", "gemma3", "phi2", "phi3", "gptneox",
                                       "falcon", "gpt-oss", "bloom", "mpt",
                                       "starcoder", "starcoder2",
                                       "command-r", "olmo2", "granite",
                                       "granitemoe", "nemotron",
                                       "stablelm", "glm4", "dbrx",
                                       "phimoe", "smollm3", "ernie4_5",
                                       "olmoe", "glm4moe", "qwen3next"],
                    default=None)
    ap.add_argument("--top-k", type=int, default=40)
    ap.add_argument("--top-p", type=float, default=0.95)
    ap.add_argument("--temp", type=float, default=0.8)
    ap.add_argument("--seed", type=int, default=-1)
    ap.add_argument("--quantized", action="store_true", help="keep weights packed (Pallas kernels)")
    ap.add_argument("--max-seq", type=int, default=512)
    ap.add_argument("--verbose", action="store_true",
                    help="print the kernel-selection report (which layers hit "
                         "gemv/matmul/dense-fallback) after generation")
    ap.add_argument("--lora", default=None,
                    help="adapter GGUF (tools/finetune.py --lora-out) merged "
                         "into the dense weights at load")
    args = ap.parse_args()
    if args.lora and args.quantized:
        raise SystemExit("--lora merges into dense weights; drop --quantized")

    import jax
    import jax.numpy as jnp

    from ggml_tpu.gguf import GGUFFile
    from ggml_tpu.sampling import sample_top_k_top_p
    from ggml_tpu.tokenizer import BPETokenizer, SPMTokenizer

    g = GGUFFile(args.model)
    arch = args.arch or g.metadata.get("general.architecture", "gpt2")
    t_load0 = time.perf_counter()
    if arch == "gptj":
        from ggml_tpu.models.gptj import GPTJ as Model
    elif arch in ("llama", "qwen2", "qwen3", "qwen2moe", "qwen3moe",
                  "granite", "granitemoe", "smollm3", "ernie4_5"):
        # llama layout (+biases / +qk-norm / +MoE experts / +granite scales
        # / +NoPE layers / +interleaved rope)
        from ggml_tpu.models.llama import Llama as Model
    elif arch == "deepseek2":
        from ggml_tpu.models.deepseek import Deepseek as Model
    elif arch in ("gemma2", "gemma3"):
        from ggml_tpu.models.gemma2 import Gemma2 as Model
    elif arch == "phi2":
        from ggml_tpu.models.phi2 import Phi2 as Model
    elif arch == "phi3":
        from ggml_tpu.models.phi3 import Phi3 as Model
    elif arch == "bloom":
        from ggml_tpu.models.bloom import Bloom as Model
    elif arch == "mpt":
        from ggml_tpu.models.mpt import MPT as Model
    elif arch == "starcoder":
        from ggml_tpu.models.starcoder import StarCoder as Model
    elif arch == "starcoder2":
        from ggml_tpu.models.starcoder2 import StarCoder2 as Model
    elif arch == "command-r":
        from ggml_tpu.models.cohere import Cohere as Model
    elif arch == "olmo2":
        from ggml_tpu.models.olmo2 import Olmo2 as Model
    elif arch == "nemotron":
        from ggml_tpu.models.nemotron import Nemotron as Model
    elif arch == "stablelm":
        from ggml_tpu.models.stablelm import StableLM as Model
    elif arch == "glm4":
        from ggml_tpu.models.glm4 import GLM4 as Model
    elif arch == "dbrx":
        from ggml_tpu.models.dbrx import DBRX as Model
    elif arch == "phimoe":
        from ggml_tpu.models.phimoe import PhiMoE as Model
    elif arch == "olmoe":
        from ggml_tpu.models.olmoe import OlmoE as Model
    elif arch == "glm4moe":
        from ggml_tpu.models.glm4moe import GLM4MoE as Model
    elif arch == "qwen3next":
        from ggml_tpu.models.qwen3next import Qwen3Next as Model
    elif arch == "gptneox":
        from ggml_tpu.models.neox import NeoX as Model
    elif arch == "falcon":
        from ggml_tpu.models.falcon import Falcon as Model
    elif arch == "gpt-oss":
        from ggml_tpu.models.gptoss import GptOss as Model
    else:
        from ggml_tpu.models.gpt2 import GPT2 as Model
    m = Model.from_gguf(args.model, keep_quantized=args.quantized, max_seq=args.max_seq, batch=1)
    if args.lora:
        from ggml_tpu.opt.lora import apply_lora_to_params

        m.params = apply_lora_to_params(m.params, args.lora)
    t_load = time.perf_counter() - t_load0

    tok = None
    if "tokenizer.ggml.tokens" in g.metadata:
        model_kind = (g.metadata.get("tokenizer.ggml.model") or ["gpt2"])
        model_kind = model_kind[0] if isinstance(model_kind, (list, tuple)) else model_kind
        tok = SPMTokenizer.from_gguf(g) if model_kind == "llama" else BPETokenizer.from_gguf(g)
        ids = np.asarray([tok.encode(args.prompt)], np.int32)
    else:
        print("(no tokenizer in GGUF; prompt interpreted as space-separated ids)", file=sys.stderr)
        ids = np.asarray([[int(t) for t in args.prompt.split()]], np.int32)

    key = jax.random.PRNGKey(args.seed if args.seed >= 0 else int(time.time()))

    def sampler(logits, key):
        return sample_top_k_top_p(
            logits, key, top_k=args.top_k, top_p=args.top_p, temperature=args.temp
        )

    t0 = time.perf_counter()
    out = m.generate(ids, args.n_predict, sampler=sampler, key=key)
    dt = time.perf_counter() - t0

    text = tok.decode(out) if tok else " ".join(map(str, out))
    print(args.prompt + text)
    if args.verbose:
        from ggml_tpu.kernels.qmatmul import kernel_selection_report

        report = kernel_selection_report()
        print("kernel selection (distinct matmul sites):", file=sys.stderr)
        for line in report or ["  (no planar matmuls traced — dense weights)"]:
            print(f"  {line}", file=sys.stderr)
    print(
        f"\n   load time = {t_load*1000:8.2f} ms\n"
        f"predict time = {dt*1000:8.2f} ms / {dt*1000/max(1,args.n_predict):.2f} ms per token",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
