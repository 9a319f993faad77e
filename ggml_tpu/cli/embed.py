"""Sentence-embedding CLI — the llama.cpp `embedding` example analog for
BERT-family GGUFs.

Usage:
  python tools/embed.py model.gguf -p "first sentence" -p "second sentence"
Prints one line per prompt: the (optionally L2-normalized) embedding, plus
the pairwise cosine matrix when given several prompts.
"""

import argparse
import sys

import numpy as np



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("-p", "--prompt", action="append", required=True)
    ap.add_argument("--no-normalize", action="store_true")
    ap.add_argument("--pooling", default=None, choices=[None, "mean", "cls", "pooler"])
    args = ap.parse_args()

    from ggml_tpu.gguf import GGUFFile
    from ggml_tpu.models.bert import Bert, pool
    from ggml_tpu.tokenizer import WPMTokenizer

    g = GGUFFile(args.model)
    m = Bert.from_gguf(args.model)
    if "tokenizer.ggml.tokens" in g.metadata:
        tok = WPMTokenizer.from_gguf(g)
        seqs = [tok.encode(p) for p in args.prompt]
    else:
        print("(no tokenizer in GGUF; prompts interpreted as space-separated ids)",
              file=sys.stderr)
        seqs = [[int(t) for t in p.split()] for p in args.prompt]

    # one static (B, T) bucket; ragged rows ride the padding mask
    t = max(len(s) for s in seqs)
    toks = np.zeros((len(seqs), t), np.int32)
    mask = np.zeros((len(seqs), t), np.float32)
    for r, s in enumerate(seqs):
        toks[r, :len(s)] = s
        mask[r, :len(s)] = 1.0

    if args.pooling:
        h, _ = m.encode(toks, mask)
        import jax.numpy as jnp

        e = pool(m.params, m.cfg, h, jnp.asarray(mask), kind=args.pooling)
        e = np.asarray(e)
        if not args.no_normalize:
            e = e / np.linalg.norm(e, axis=-1, keepdims=True)
    else:
        _, e = m.encode(toks, mask, normalize=not args.no_normalize)
        e = np.asarray(e)

    for r, p in enumerate(args.prompt):
        head = " ".join(f"{v:.6f}" for v in e[r, :8])
        print(f"embedding {r} ({len(seqs[r])} tokens): [{head} ...] dim={e.shape[1]}")
    if len(seqs) > 1:
        en = e / np.linalg.norm(e, axis=-1, keepdims=True)
        cos = en @ en.T
        print("cosine similarity:")
        for row in cos:
            print("  " + " ".join(f"{v:6.3f}" for v in row))


if __name__ == "__main__":
    main()
