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



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("-p", "--prompt", default="Hello")
    ap.add_argument("-n", "--n-predict", type=int, default=64)
    ap.add_argument("--arch", default=None,
                    help="override GGUF general.architecture (see "
                         "ggml_tpu.models.registry.ARCHS for the full list)")
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
    ap.add_argument("--grammar", default=None,
                    help="GBNF grammar file constraining generation "
                         "(llama.cpp grammars; host-side sampling)")
    args = ap.parse_args()
    if args.lora and args.quantized:
        raise SystemExit("--lora merges into dense weights; drop --quantized")

    import jax
    import jax.numpy as jnp

    from ggml_tpu.gguf import GGUFFile
    from ggml_tpu.sampling import sample_top_k_top_p

    g = GGUFFile(args.model)
    arch = args.arch or g.metadata.get("general.architecture", "gpt2")
    t_load0 = time.perf_counter()
    from ggml_tpu.models.registry import load_model, load_tokenizer

    m = load_model(args.model, arch=arch, keep_quantized=args.quantized,
                   max_seq=args.max_seq, batch=1)
    if args.lora:
        from ggml_tpu.opt.lora import apply_lora_to_params

        m.params = apply_lora_to_params(m.params, args.lora)
    t_load = time.perf_counter() - t_load0

    tok = load_tokenizer(g)
    if tok is not None:
        ids = np.asarray([tok.encode(args.prompt)], np.int32)
    else:
        print("(no tokenizer in GGUF; prompt interpreted as space-separated ids)", file=sys.stderr)
        ids = np.asarray([[int(t) for t in args.prompt.split()]], np.int32)

    key = jax.random.PRNGKey(args.seed if args.seed >= 0 else int(time.time()))

    if args.grammar:
        from ggml_tpu.grammar import GrammarSampler

        if tok is None:
            raise SystemExit("--grammar needs a tokenizer in the GGUF")
        eos_meta = g.metadata.get("tokenizer.ggml.eos_token_id", -1)
        eos_meta = int(eos_meta[0] if isinstance(eos_meta, (list, tuple))
                       else eos_meta)
        sampler = GrammarSampler(open(args.grammar).read(), tok,
                                 eos_id=eos_meta)
    else:
        def sampler(logits, key):
            return sample_top_k_top_p(
                logits, key, top_k=args.top_k, top_p=args.top_p,
                temperature=args.temp
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
