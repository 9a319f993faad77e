"""Split a GGUF into llama.cpp-convention shards, or merge shards back.

  python tools/gguf_split.py model.gguf out/model --split-max-tensors 128
  python tools/gguf_split.py --merge out/model-00001-of-00003.gguf merged.gguf

Shards are named <prefix>-00001-of-0000N.gguf with split.no / split.count /
split.tensors.count metadata (the gguf-split tool's convention).  The
reader side is transparent: GGUFFile on the FIRST shard merges the
siblings' tensor tables, so every model loads from a split unchanged.
"""

import argparse
import sys

sys.path.insert(0, ".")

from ggml_tpu.gguf import GGUFFile, GGUFValueType, GGUFWriter


def _copy_kv(w: GGUFWriter, g: GGUFFile, skip_split: bool = True):
    import numpy as np

    for key, val in g.metadata.items():
        if skip_split and key.startswith("split."):
            continue
        if isinstance(val, str):
            w.add_string(key, val)
        elif isinstance(val, bool):
            w.add_bool(key, val)
        elif isinstance(val, int):
            w.add_value(key, GGUFValueType.INT64
                        if val < 0 else GGUFValueType.UINT64, val)
        elif isinstance(val, float):
            w.add_f32(key, val)
        elif isinstance(val, (list, tuple)):
            w.add_array(key, list(val))
        elif isinstance(val, np.ndarray):
            w.add_array(key, val.tolist())
        else:
            raise TypeError(f"unhandled metadata type for {key}: {type(val)}")


def split(src: str, prefix: str, max_tensors: int = 0, n_split: int = 0):
    g = GGUFFile(src)
    names = list(g.tensors)
    if n_split <= 0:
        if max_tensors <= 0:
            raise SystemExit("pass --split-max-tensors or --splits")
        n_split = -(-len(names) // max_tensors)
    per = -(-len(names) // n_split)
    chunks = [names[i * per:(i + 1) * per] for i in range(n_split)]
    chunks = [c for c in chunks if c]
    n_split = len(chunks)
    paths = []
    for i, chunk in enumerate(chunks):
        w = GGUFWriter(alignment=g.alignment)
        if i == 0:
            _copy_kv(w, g)
        w.add_value("split.no", GGUFValueType.UINT16, i)
        w.add_value("split.count", GGUFValueType.UINT16, n_split)
        w.add_value("split.tensors.count", GGUFValueType.INT32, len(g.tensors))
        for name in chunk:
            t = g.tensors[name]
            w.add_tensor(name, g.tensor_bytes(name), t.ggml_type,
                         raw_shape_ne=t.shape_ne)
        path = f"{prefix}-{i + 1:05d}-of-{n_split:05d}.gguf"
        w.write(path)
        paths.append(path)
    g.close()
    return paths


def merge(first_shard: str, out: str):
    g = GGUFFile(first_shard)  # transparently merges the shard tables
    if int(g.metadata.get("split.count", 0) or 0) <= 1:
        raise SystemExit(f"{first_shard} is not the first shard of a split")
    w = GGUFWriter(alignment=g.alignment)
    _copy_kv(w, g)
    for name, t in g.tensors.items():
        w.add_tensor(name, g.tensor_bytes(name), t.ggml_type,
                     raw_shape_ne=t.shape_ne)
    w.write(out)
    g.close()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--merge", action="store_true",
                    help="merge shards (src = first shard) into one file")
    ap.add_argument("src")
    ap.add_argument("out", help="output prefix (split) or path (merge)")
    ap.add_argument("--split-max-tensors", type=int, default=0)
    ap.add_argument("--splits", type=int, default=0)
    args = ap.parse_args()
    if args.merge:
        print("wrote", merge(args.src, args.out))
    else:
        for p in split(args.src, args.out, args.split_max_tensors, args.splits):
            print("wrote", p)


if __name__ == "__main__":
    main()
