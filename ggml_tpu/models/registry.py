"""Arch registry: GGUF general.architecture -> model family class.

The analog of llama.cpp's LLM_ARCH table — one place that maps every
supported architecture string to its inference wrapper, shared by
tools/generate.py, tools/server.py and any embedder.  Families whose
wrapper serves several arch strings (llama, glm4moe, mamba, gemma2)
list each alias explicitly.
"""

from __future__ import annotations

import importlib

# arch -> (module under ggml_tpu.models, wrapper class name)
ARCHS: dict[str, tuple[str, str]] = {
    "gpt2": ("gpt2", "GPT2"),
    "gptj": ("gptj", "GPTJ"),
    # llama family (+qkv biases / qk-norm / MoE / granite scales / NoPE /
    # interleaved rope / decoupled head_dim)
    "llama": ("llama", "Llama"),
    "qwen2": ("llama", "Llama"),
    "qwen3": ("llama", "Llama"),
    "qwen2moe": ("llama", "Llama"),
    "qwen3moe": ("llama", "Llama"),
    "granite": ("llama", "Llama"),
    "granitemoe": ("llama", "Llama"),
    "smollm3": ("llama", "Llama"),
    "ernie4_5": ("llama", "Llama"),
    "helium": ("llama", "Llama"),
    "seed_oss": ("llama", "Llama"),
    "deepseek2": ("deepseek", "Deepseek"),
    "gemma": ("gemma2", "Gemma2"),
    "gemma2": ("gemma2", "Gemma2"),
    "gemma3": ("gemma2", "Gemma2"),
    "phi2": ("phi2", "Phi2"),
    "phi3": ("phi3", "Phi3"),
    "phimoe": ("phimoe", "PhiMoE"),
    "gptneox": ("neox", "NeoX"),
    "falcon": ("falcon", "Falcon"),
    "gpt-oss": ("gptoss", "GptOss"),
    "bloom": ("bloom", "Bloom"),
    "mpt": ("mpt", "MPT"),
    "starcoder": ("starcoder", "StarCoder"),
    "starcoder2": ("starcoder2", "StarCoder2"),
    "command-r": ("cohere", "Cohere"),
    "olmo": ("olmo", "Olmo"),
    "olmo2": ("olmo2", "Olmo2"),
    "olmo3": ("olmo2", "Olmo2"),
    "persimmon": ("persimmon", "Persimmon"),
    "olmoe": ("olmoe", "OlmoE"),
    "nemotron": ("nemotron", "Nemotron"),
    "stablelm": ("stablelm", "StableLM"),
    "glm": ("glm4", "GLM4"),
    "glm4": ("glm4", "GLM4"),
    "glm4moe": ("glm4moe", "GLM4MoE"),
    "dots1": ("glm4moe", "GLM4MoE"),
    "dbrx": ("dbrx", "DBRX"),
    "qwen3next": ("qwen3next", "Qwen3Next"),
    "bamba": ("bamba", "Bamba"),
    "jamba": ("jamba", "Jamba"),
    "mamba": ("mamba", "Mamba"),
    "falcon_mamba": ("mamba", "Mamba"),
    "mamba2": ("mamba2", "Mamba2"),
    "rwkv": ("rwkv", "RWKV"),
    "xlstm": ("xlstm", "XLSTM"),
    "recurrentgemma": ("recurrentgemma", "RecurrentGemma"),
    "lfm2": ("lfm2", "LFM2"),
    "llama4": ("llama4", "Llama4"),
    "apertus": ("apertus", "Apertus"),
    "granitehybrid": ("granitehybrid", "GraniteHybrid"),
    "minimax": ("minimax", "MiniMax"),
    "zamba2": ("zamba2", "Zamba2"),
    "chameleon": ("chameleon", "Chameleon"),
    "jetmoe": ("jetmoe", "JetMoe"),
}

# recurrent/O(1)-state families take (batch,) only — no max_seq kwarg
_STATE_ONLY = {"mamba", "falcon_mamba", "mamba2", "rwkv", "xlstm"}


def model_class(arch: str):
    """Resolve an architecture string to its wrapper class."""
    if arch not in ARCHS:
        raise KeyError(f"unknown architecture {arch!r}; known: {sorted(ARCHS)}")
    mod, cls = ARCHS[arch]
    return getattr(importlib.import_module(f"..{mod}", __name__), cls)


def load_model(path, arch: str | None = None, max_seq: int = 512,
               batch: int = 1, keep_quantized: bool = False, **kw):
    """Open a GGUF file and build the right family wrapper."""
    from ..gguf import GGUFFile

    g = GGUFFile(path)
    arch = arch or g.metadata.get("general.architecture", "gpt2")
    cls = model_class(arch)
    if arch in _STATE_ONLY:
        return cls.from_gguf(path, keep_quantized=keep_quantized, batch=batch, **kw)
    return cls.from_gguf(path, keep_quantized=keep_quantized, max_seq=max_seq,
                         batch=batch, **kw)


def load_tokenizer(g):
    """Tokenizer from GGUF metadata (BPE or SPM), or None if absent."""
    from ..tokenizer import BPETokenizer, SPMTokenizer

    if "tokenizer.ggml.tokens" not in g.metadata:
        return None
    kind = g.metadata.get("tokenizer.ggml.model") or ["gpt2"]
    kind = kind[0] if isinstance(kind, (list, tuple)) else kind
    return SPMTokenizer.from_gguf(g) if kind == "llama" else BPETokenizer.from_gguf(g)
