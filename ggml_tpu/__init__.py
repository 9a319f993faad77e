"""ggml_tpu — a TPU-native tensor / quantized-inference / training framework
with the capabilities of ggml (see README.md and SURVEY.md).

Public surface (lazy imports keep `import ggml_tpu` light):

    ggml_tpu.GGUFFile / GGUFWriter      GGUF v3 container
    ggml_tpu.GGMLType                   on-disk dtype ids + traits
    ggml_tpu.quantize / dequantize      bit-exact reference (de)quantizers
    ggml_tpu.repack / planar_matmul     planar layout + fused Pallas matmul
    ggml_tpu.flash_attention            fused attention kernel
    ggml_tpu.models.{gpt2,gptj,llama,mnist,sam,yolo,magika}
    ggml_tpu.opt                        Dataset/Optimizer/fit (ggml-opt analog)
    ggml_tpu.serve.Engine               continuous-batching engine
    ggml_tpu.speculative_generate       lossless draft-and-verify decoding
    ggml_tpu.checkpoint                 GGUF-backed save/resume
    ggml_tpu.parallel                   mesh/tp/pp/ep/distributed
"""

__version__ = "0.1.0"

_LAZY = {
    "GGUFFile": ("ggml_tpu.gguf", "GGUFFile"),
    "GGUFWriter": ("ggml_tpu.gguf", "GGUFWriter"),
    "GGMLType": ("ggml_tpu.dtypes", "GGMLType"),
    "quantize": ("ggml_tpu.quant.reference", "quantize"),
    "dequantize": ("ggml_tpu.quant.reference", "dequantize"),
    "repack": ("ggml_tpu.quant.planar", "repack"),
    "PlanarWeight": ("ggml_tpu.quant.planar", "PlanarWeight"),
    "planar_matmul": ("ggml_tpu.kernels.qmatmul", "planar_matmul"),
    "flash_attention": ("ggml_tpu.kernels.flash_attn", "flash_attention"),
    "perplexity": ("ggml_tpu.ppl", "perplexity"),
    "speculative_generate": ("ggml_tpu.speculative", "speculative_generate"),
    "speculative_generate_sampled": ("ggml_tpu.speculative", "speculative_generate_sampled"),
    "make_speculative_decoder": ("ggml_tpu.speculative", "make_speculative_decoder"),
    "make_speculative_decoder_sampled": ("ggml_tpu.speculative", "make_speculative_decoder_sampled"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'ggml_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(list(_LAZY) + ["models", "opt", "serve", "checkpoint", "parallel", "ops", "speculative"])
