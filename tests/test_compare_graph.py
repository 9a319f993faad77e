"""Per-node graph comparator (the ggml_backend_compare_graph_backend analog,
reference include/ggml-backend.h:342): evaluates a jaxpr equation-by-equation
on two backends and NMSE-compares every node's outputs."""

import numpy as np

import jax
import jax.numpy as jnp

from ggml_tpu.dtypes import GGMLType
from ggml_tpu.quant import reference as R
from ggml_tpu.quant.planar import repack
from ggml_tpu.kernels.qmatmul import planar_matmul
from ggml_tpu.utils.compare import compare_graph


def _quantized_linear_fn():
    n, k = 256, 512
    rng = np.random.default_rng(11)
    w = (rng.standard_normal((n, k)) * 0.5).astype(np.float32)
    raw = R.quantize(w, GGMLType.Q4_K).reshape(n, -1)
    pw = repack(raw, GGMLType.Q4_K, (n, k))
    x = jnp.asarray((rng.standard_normal((1, k)) * 0.5).astype(np.float32))

    def fn(x):
        h = planar_matmul(x, pw, interpret=True)
        h = jax.nn.gelu(h)
        return h.sum(axis=-1)

    return fn, x


def test_compare_graph_identical_backends_ok():
    fn, x = _quantized_linear_fn()
    res = compare_graph(fn, x, device=jax.devices("cpu")[0],
                        spec_device=jax.devices("cpu")[0])
    assert res.ok, res.summary()
    assert len(res.nodes) > 3  # per-equation granularity, not one blob
    prims = {r.primitive for r in res.nodes}
    assert "pallas_call" in prims  # the quantized GEMV is compared per node


def test_compare_graph_reports_first_divergence():
    fn, x = _quantized_linear_fn()
    # force the tolerance below fp round-off: the report machinery must
    # localize a "divergent" node with index/primitive/source intact
    res = compare_graph(fn, x, device=jax.devices("cpu")[0],
                        spec_device=jax.devices("cpu")[0], nmse_tol=-1.0)
    assert not res.ok
    fd = res.first_divergent
    assert fd is not None and fd.index == 0
    assert "FIRST DIVERGENT" in res.summary()


def test_compare_graph_model_step():
    """Whole tiny-model forward step compared node-by-node (the reference's
    MODE_TEST over a real graph rather than a single op)."""
    from ggml_tpu.models.gptj import forward, init_cache, random_config, synth_quantized_params

    cfg = random_config("tiny")
    params = synth_quantized_params(cfg, GGMLType.Q4_K, seed=0)
    cache = init_cache(cfg, 1, 32, jnp.float32)
    tok = jnp.asarray([[3]], jnp.int32)
    pos0 = jnp.zeros((1,), jnp.int32)

    def fn(tok, pos0, cache):
        logits, _ = forward(params, cfg, tok, pos0, cache, jnp.int32(0))
        return logits

    res = compare_graph(fn, tok, pos0, cache, device=jax.devices("cpu")[0],
                        spec_device=jax.devices("cpu")[0])
    assert res.ok, res.summary()


def test_compare_graph_model_step_on_chip():
    """Stage-4a on-chip pass (GGML_TPU_TESTS=1): the SAME tiny-model decode
    step compared node-by-node with the REAL TPU as the device side and the
    CPU interpret-mode spec as the reference — localizes any Mosaic-only
    miscompile to its first divergent primitive (the on-hardware
    ggml_backend_compare_graph_backend run the CPU suite cannot give)."""
    import os

    import pytest

    if os.environ.get("GGML_TPU_TESTS", "0") != "1":
        pytest.skip("on-chip comparator runs under GGML_TPU_TESTS=1 (ci 4a)")
    tpus = [d for d in jax.devices() if d.platform != "cpu"]
    if not tpus:
        pytest.skip("no accelerator device visible")
    from ggml_tpu.models.gptj import forward, init_cache, random_config, synth_quantized_params

    cfg = random_config("tiny")
    params = synth_quantized_params(cfg, GGMLType.Q4_K, seed=0)
    cache = init_cache(cfg, 1, 32, jnp.float32)
    tok = jnp.asarray([[3]], jnp.int32)
    pos0 = jnp.zeros((1,), jnp.int32)

    def fn(tok, pos0, cache):
        logits, _ = forward(params, cfg, tok, pos0, cache, jnp.int32(0))
        return logits

    res = compare_graph(fn, tok, pos0, cache, device=tpus[0],
                        spec_device=jax.devices("cpu")[0],
                        # bf16 matmuls on device vs f32 interpret spec
                        nmse_tol=1e-4)
    assert res.ok, res.summary()
