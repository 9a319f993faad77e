"""Per-node differential graph comparison: TPU backend vs CPU spec.

The reference's central numeric-debug tool runs one graph on two backends and
compares every node's output (ggml_backend_compare_graph_backend,
include/ggml-backend.h:342, used by tests/test-backend-ops.cpp MODE_TEST with
a per-node NMSE callback).  The TPU-native analog here traces a function to a
jaxpr and evaluates it equation by equation TWICE:

  * device side — each primitive dispatched to the accelerator (Mosaic-
    compiled Pallas kernels included);
  * spec side   — the same primitive on CPU, with every pallas_call rebound
    with interpret=True (the "CPU backend is the executable specification"
    idiom, SURVEY.md §4).

After every equation the outputs are NMSE-compared, so a Mosaic-only
miscompile (or an op with TPU-specific numerics) is localized to the FIRST
divergent primitive instead of surfacing as an opaque end-to-end logit diff.

Control-flow primitives (scan/while/cond) and nested pjit calls compare at
their boundary outputs; pass a single unrolled step for op-level granularity.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import numpy as np
from jax import tree_util


@dataclasses.dataclass
class NodeReport:
    index: int
    primitive: str
    shapes: tuple
    nmse: float
    source: str = ""


@dataclasses.dataclass
class CompareResult:
    nodes: list[NodeReport]
    first_divergent: NodeReport | None
    ok: bool

    def summary(self, max_rows: int = 20) -> str:
        rows = [
            f"{'#':>4} {'nmse':>12}  primitive [shape] (source)",
        ]
        worst = sorted(self.nodes, key=lambda r: -r.nmse)[:max_rows]
        for r in worst:
            rows.append(
                f"{r.index:>4} {r.nmse:>12.3e}  {r.primitive} {list(r.shapes)} {r.source}"
            )
        if self.first_divergent is not None:
            fd = self.first_divergent
            rows.append(
                f"FIRST DIVERGENT NODE: #{fd.index} {fd.primitive} nmse={fd.nmse:.3e} {fd.source}"
            )
        else:
            rows.append(f"all {len(self.nodes)} nodes within tolerance")
        return "\n".join(rows)


def _nmse(a, b) -> float:
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    if a.size == 0:
        return 0.0
    denom = float((a * a).sum())
    err = float(((a - b) ** 2).sum())
    if denom == 0.0:
        return err
    return err / denom


def _is_float(x) -> bool:
    try:
        return np.issubdtype(np.asarray(x).dtype, np.floating)
    except Exception:
        return False


def compare_graph(
    fn: Callable,
    *args: Any,
    device=None,
    spec_device=None,
    nmse_tol: float = 1e-5,
    per_primitive_tol: dict[str, float] | None = None,
) -> CompareResult:
    """Run fn's jaxpr node-by-node on `device` (default: first accelerator)
    and on `spec_device` (default: first CPU device, Pallas in interpret
    mode), NMSE-comparing after every equation.

    Returns a CompareResult; `ok` is False if any float output diverges
    beyond tolerance.  Tolerance can be overridden per primitive name via
    per_primitive_tol (the reference's per-case max_nmse_err idiom,
    tests/test-backend-ops.cpp:319)."""
    if device is None:
        accels = [d for d in jax.devices() if d.platform != "cpu"]
        device = accels[0] if accels else jax.devices()[0]
    if spec_device is None:
        spec_device = jax.devices("cpu")[0]
    per_primitive_tol = per_primitive_tol or {}

    closed = jax.make_jaxpr(fn)(*args)
    jaxpr, consts = closed.jaxpr, closed.consts
    flat_args = tree_util.tree_leaves(args)

    env_dev: dict = {}
    env_spec: dict = {}

    def write(var, dev_val, spec_val):
        env_dev[var] = dev_val
        env_spec[var] = spec_val

    def read(var, env):
        if type(var).__name__ == "Literal":
            return var.val
        return env[var]

    for var, const in zip(jaxpr.constvars, consts):
        write(var, jax.device_put(const, device), jax.device_put(const, spec_device))
    for var, arg in zip(jaxpr.invars, flat_args):
        write(var, jax.device_put(arg, device), jax.device_put(arg, spec_device))

    # phase 1: dispatch every equation on both backends WITHOUT fetching —
    # per-node np.asarray syncs cost a full relay round trip each on the
    # remote-TPU path (hundreds of nodes x ~150 ms made the on-chip pass
    # minutes-long); deferred comparison keeps the device pipeline full and
    # fetches everything in one batched device_get at the end.
    staged: list[tuple[int, Any, list, list]] = []  # (idx, eqn, out_dev, out_spec)
    counter = [0]

    def run_eqns(eqns, env_dev, env_spec):
        for eqn in eqns:
            in_dev = [read(v, env_dev) for v in eqn.invars]
            in_spec = [read(v, env_spec) for v in eqn.invars]

            # custom-differentiation wrappers (planar_matmul's activation
            # VJP et al.) are TRANSPARENT: descend into the primal jaxpr so
            # the pallas_call inside still compares per node
            if eqn.primitive.name in ("custom_vjp_call", "custom_jvp_call",
                                      "custom_vjp_call_jaxpr"):
                inner = eqn.params["call_jaxpr"]
                sub_dev: dict = {}
                sub_spec: dict = {}
                for var, const in zip(inner.jaxpr.constvars, inner.consts):
                    sub_dev[var] = jax.device_put(const, device)
                    sub_spec[var] = jax.device_put(const, spec_device)
                for var, dv, sv in zip(inner.jaxpr.invars, in_dev, in_spec):
                    sub_dev[var] = dv
                    sub_spec[var] = sv
                run_eqns(inner.jaxpr.eqns, sub_dev, sub_spec)
                outs_dev = [read(v, sub_dev) for v in inner.jaxpr.outvars]
                outs_spec = [read(v, sub_spec) for v in inner.jaxpr.outvars]
                for var, od, os_ in zip(eqn.outvars, outs_dev, outs_spec):
                    if type(var).__name__ != "DropVar":
                        env_dev[var] = od
                        env_spec[var] = os_
                continue

            subfuns, bind_params = eqn.primitive.get_bind_params(eqn.params)

            with jax.default_device(device):
                out_dev = eqn.primitive.bind(*subfuns, *in_dev, **bind_params)

            spec_params = dict(bind_params)
            if eqn.primitive.name == "pallas_call" and "interpret" in spec_params:
                spec_params["interpret"] = True
            with jax.default_device(spec_device):
                out_spec = eqn.primitive.bind(*subfuns, *in_spec, **spec_params)

            if not eqn.primitive.multiple_results:
                out_dev, out_spec = [out_dev], [out_spec]

            staged.append((counter[0], eqn, out_dev, out_spec))
            counter[0] += 1
            for var, od, os_ in zip(eqn.outvars, out_dev, out_spec):
                if type(var).__name__ != "DropVar":
                    env_dev[var] = od
                    env_spec[var] = os_

    run_eqns(jaxpr.eqns, env_dev, env_spec)

    # phase 2: one batched fetch, then per-node comparison
    host_dev = jax.device_get([od for _, _, out_dev, _ in staged for od in out_dev])
    host_spec = jax.device_get([os_ for _, _, _, out_spec in staged for os_ in out_spec])

    reports: list[NodeReport] = []
    first_div: NodeReport | None = None
    cursor = 0
    for i, eqn, out_dev, out_spec in staged:
        n_out = len(out_dev)
        worst = 0.0
        shapes = []
        for od, os_ in zip(host_dev[cursor:cursor + n_out],
                           host_spec[cursor:cursor + n_out]):
            shapes.append(getattr(od, "shape", ()))
            if _is_float(od):
                worst = max(worst, _nmse(np.asarray(os_), np.asarray(od)))
            else:  # integer/bool outputs must match exactly
                worst = max(worst, 0.0 if np.array_equal(np.asarray(os_), np.asarray(od)) else float("inf"))
        cursor += n_out
        src = ""
        try:
            frame = jax._src.source_info_util.user_frame(eqn.source_info.traceback)
            if frame is not None:
                src = f"{frame.file_name.rsplit('/', 1)[-1]}:{frame.start_line}"
        except Exception:
            pass
        rep = NodeReport(i, eqn.primitive.name, tuple(shapes), worst, src)
        reports.append(rep)
        tol = per_primitive_tol.get(eqn.primitive.name, nmse_tol)
        if worst > tol and first_div is None:
            first_div = rep

    return CompareResult(nodes=reports, first_divergent=first_div, ok=first_div is None)
