"""Requantize a GGUF model file — the analog of the reference's per-example
quantize tools (examples/common-ggml.cpp ggml_common_quantize_0,
examples/gpt-2/quantize.cpp). 2-D matmul weights whose row length divides the
block size are converted to the target type; norms/biases/1-D tensors stay
f32 (same policy as the reference, examples/common-ggml.cpp skip rules).

Usage: python tools/quantize_gguf.py in.gguf out.gguf q4_k
"""

import sys

import numpy as np

from ggml_tpu.dtypes import GGMLType, get_type_traits
from ggml_tpu.gguf import GGUFFile, GGUFWriter
from ggml_tpu.quant import reference as R

FTYPES = {
    "f16": GGMLType.F16, "q4_0": GGMLType.Q4_0, "q4_1": GGMLType.Q4_1,
    "q5_0": GGMLType.Q5_0, "q5_1": GGMLType.Q5_1, "q8_0": GGMLType.Q8_0,
    "q2_k": GGMLType.Q2_K, "q3_k": GGMLType.Q3_K, "q4_k": GGMLType.Q4_K,
    "q5_k": GGMLType.Q5_K, "q6_k": GGMLType.Q6_K, "tq1_0": GGMLType.TQ1_0,
    "tq2_0": GGMLType.TQ2_0, "iq4_nl": GGMLType.IQ4_NL,
    "iq4_xs": GGMLType.IQ4_XS, "iq2_xxs": GGMLType.IQ2_XXS,
    "iq2_xs": GGMLType.IQ2_XS, "iq2_s": GGMLType.IQ2_S,
    "iq3_xxs": GGMLType.IQ3_XXS, "iq3_s": GGMLType.IQ3_S,
    "iq1_s": GGMLType.IQ1_S, "iq1_m": GGMLType.IQ1_M,
}


def quantize_gguf(src_path, dst_path, ftype: GGMLType, verbose: bool = True,
                  imatrix: dict | None = None):
    """imatrix: optional {tensor_name: (n_per_row,) fp32 importance weights} —
    switches eligible tensors to the reference's weighted quantizers
    (quantize_<T> with quant_weights, src/ggml-quants.c)."""
    from ggml_tpu.quant.imatrix import (
        quantize_with_imatrix,
        requires_imatrix,
        supported_imatrix_types,
    )

    if requires_imatrix(ftype) and not imatrix:
        raise ValueError(
            f"{GGMLType(ftype).name} requires an importance matrix "
            "(reference: ggml_quantize_requires_imatrix)"
        )
    g = GGUFFile(src_path)
    w = GGUFWriter(alignment=g.alignment)
    for key, val in g.metadata.items():
        if key == "general.file_type":
            continue
        _copy_kv(w, key, val)

    # Two-phase STREAMING write (reference's meta-only + append modes,
    # include/gguf.h:164-192): first declare every tensor's final type/shape,
    # then quantize + append ONE tensor at a time — peak writer memory is one
    # dequantized tensor, so a larger-than-RAM model converts in bounded RAM.
    def _target_type(name, info):
        shape = tuple(info.shape)
        quantizable = (
            name.endswith(".weight")
            and len(shape) == 2
            and "norm" not in name
            and shape[-1] % get_type_traits(ftype).block_size == 0
            and ftype in set(R.supported_quant_types()) | {GGMLType.F16}
        )
        return ftype if quantizable else GGMLType.F32

    for name, info in g.tensors.items():
        t = _target_type(name, info)
        w.add_tensor_info(name, tuple(reversed(info.shape)), t)

    total_in = total_out = 0
    with w.write_meta(dst_path) as appender:
        for name, info in g.tensors.items():
            t = _target_type(name, info)
            data = g.to_float32(name)
            qw = imatrix.get(name) if (imatrix and t == ftype) else None
            if qw is not None and t in supported_imatrix_types():
                blob = quantize_with_imatrix(
                    data.reshape(-1, data.shape[-1]), t, qw).reshape(-1).view(np.uint8)
            elif t == GGMLType.F32:
                blob = np.ascontiguousarray(data, np.float32)
            else:
                from ggml_tpu.native import fast_quantize

                blob = fast_quantize(data, t)
            appender.append(name, blob)
            total_in += info.n_bytes
            from ggml_tpu.dtypes import row_size

            total_out += row_size(t, data.shape[-1]) * int(np.prod(data.shape[:-1]))
            if verbose:
                print(f"{name:48s} {str(data.shape):>18} {GGMLType(info.ggml_type).name:>8} -> {t.name}")
            del data, blob  # bound peak memory to one tensor
    if verbose:
        print(f"total: {total_in/1e6:.1f} MB -> {total_out/1e6:.1f} MB")
    g.close()


def _copy_kv(w: GGUFWriter, key, val):
    if isinstance(val, bool):
        w.add_bool(key, val)
    elif isinstance(val, int):
        w.add_i32(key, val) if abs(val) < 2**31 else w.add_u64(key, val)
    elif isinstance(val, float):
        w.add_f32(key, val)
    elif isinstance(val, str):
        w.add_string(key, val)
    elif isinstance(val, (list, tuple, np.ndarray)):
        w.add_array(key, list(val))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("ftype", choices=sorted(FTYPES))
    ap.add_argument("--imatrix", default=None,
                    help="imatrix GGUF from tools/collect_imatrix.py "
                         "(error-weighted quantization; required for "
                         "IQ2_XXS/IQ2_XS/IQ1_S)")
    args = ap.parse_args()
    imat = None
    if args.imatrix:
        from ggml_tpu.quant.imatrix import imatrix_means, load_imatrix_gguf

        imat = imatrix_means(*load_imatrix_gguf(args.imatrix))
    quantize_gguf(args.src, args.dst, FTYPES[args.ftype.lower()], imatrix=imat)


if __name__ == "__main__":
    main()
