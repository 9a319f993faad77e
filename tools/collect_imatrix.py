"""Collect an importance matrix (imatrix) from calibration data.

The llama.cpp examples/imatrix analog: run the model over calibration
tokens, accumulate the squared input activations of every projection weight
(one hook in models/common.linear sees them all), and write the sums/counts
to a GGUF that tools/quantize_gguf.py --imatrix consumes for
error-weighted quantization (quant/imatrix.py — reference entry points
quantize_q*_imat in src/ggml-quants.c).

The forward runs EAGERLY (unjitted) — calibration is a one-off; tracers
carry no values to observe.

Usage:
  python tools/collect_imatrix.py model.gguf out.imatrix.gguf \
      --tokens calib.npy [--arch llama] [--chunk 512]
  python tools/collect_imatrix.py --merge a.gguf b.gguf -o merged.gguf

calib tokens: .npy int array, or a text file of whitespace-separated ids.
"""

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from ggml_tpu.gguf import GGUFFile
from ggml_tpu.models.common import collect_imatrix
from ggml_tpu.quant.imatrix import merge_imatrix, save_imatrix_gguf


def _load_tokens(path) -> np.ndarray:
    p = pathlib.Path(path)
    if p.suffix == ".npy":
        return np.load(p).astype(np.int32).reshape(-1)
    return np.asarray([int(t) for t in p.read_text().split()], np.int32)


def collect(model_path, tokens: np.ndarray, arch: str | None = None,
            chunk: int = 512):
    """Run the calibration pass; returns an ImatrixCollector.

    Weights must be DENSE (f32/f16 GGUF): collecting activations through an
    already-quantized model would measure the wrong distribution."""
    g = GGUFFile(model_path)
    arch = arch or g.metadata.get("general.architecture", "gpt2")
    n_chunks = len(tokens) // chunk
    if n_chunks == 0:
        raise SystemExit(f"need at least {chunk} calibration tokens (--chunk)")

    if arch == "mamba":
        from ggml_tpu.models.mamba import Mamba, forward, init_state

        m = Mamba.from_gguf(model_path, keep_quantized=False)
        with collect_imatrix(m.params) as coll:
            for i in range(n_chunks):
                seg = jnp.asarray(tokens[i * chunk:(i + 1) * chunk][None])
                forward(m.params, m.cfg, seg, init_state(m.cfg, 1))
        return coll

    if arch == "gptj":
        from ggml_tpu.models.gptj import GPTJ as Model
    elif arch in ("llama", "qwen2"):
        from ggml_tpu.models.llama import Llama as Model
    else:
        from ggml_tpu.models.gpt2 import GPT2 as Model
    # f32 weights: calibration statistics should not inherit bf16 noise
    m = Model.from_gguf(model_path, dtype=jnp.float32, keep_quantized=False,
                        max_seq=chunk, batch=1)
    fwd = sys.modules[Model.__module__].forward
    with collect_imatrix(m.params) as coll:
        for i in range(n_chunks):
            seg = jnp.asarray(tokens[i * chunk:(i + 1) * chunk][None])
            cache = m.new_cache(jnp.float32)
            fwd(m.params, m.cfg, seg, jnp.zeros((1,), jnp.int32), cache,
                jnp.int32(0), prefill=True)
    if not coll.sums:
        raise SystemExit("no activations observed — is the model dense?")
    return coll


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("inputs", nargs="+")
    ap.add_argument("-o", "--output")
    ap.add_argument("--tokens", help="calibration token ids (.npy or text)")
    ap.add_argument("--arch", default=None)
    ap.add_argument("--chunk", type=int, default=512)
    ap.add_argument("--merge", action="store_true",
                    help="inputs are imatrix GGUFs to merge (continued runs)")
    args = ap.parse_args()

    if args.merge:
        sums, counts = merge_imatrix(args.inputs)
        save_imatrix_gguf(args.output, sums, counts,
                          meta={"merged_from": " ".join(map(str, args.inputs))})
        print(f"merged {len(args.inputs)} files -> {args.output} "
              f"({len(sums)} tensors)")
        return

    model_path, out = args.inputs[0], args.output or args.inputs[1]
    toks = _load_tokens(args.tokens)
    coll = collect(model_path, toks, args.arch, args.chunk)
    save_imatrix_gguf(out, coll.sums, coll.counts,
                      meta={"chunk": args.chunk, "n_tokens": len(toks),
                            "model": str(model_path)})
    print(f"wrote {out}: {len(coll.sums)} tensors, "
          f"{len(toks) // args.chunk * args.chunk} calibration tokens")


if __name__ == "__main__":
    main()
