"""The `simple` example: a 2-tensor mul_mat through the graph API.

Reference analog: examples/simple/simple-ctx.cpp (legacy one-context API)
and simple-backend.cpp (backend/gallocr API).  Both pedagogical variants
collapse to one path here: Context records symbolic tensors, Graph.compile()
lowers the node list to a single XLA program — buffer planning (gallocr) and
scheduling (the CPU threadpool / backend sched) are the compiler's job.

Run:  python examples/simple.py
"""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from ggml_tpu.graph import Context, build_forward

# the same 4x2 / 3x2 matrices as the reference example
A = np.array(
    [[2, 8],
     [5, 1],
     [4, 2],
     [8, 6]], dtype=np.float32)
B = np.array(
    [[10, 5],
     [9, 9],
     [5, 4]], dtype=np.float32)


def main():
    ctx = Context()
    # load data into the "model": tensors with bound data are graph leafs
    a = ctx.new_tensor(A.shape, data=A, name="a")
    # `b` stays an input: the graph is compiled once, then fed values
    b = ctx.new_tensor(B.shape, name="b")

    # ggml_mul_mat(a, b): result_{ij} = sum_k B_{ik} A_{jk}  (b @ a^T)
    result = ctx.mul_mat(a, b).set_output()

    graph = build_forward([result])
    graph.print()  # ggml_graph_print analog

    compute = graph.compile()  # one fused XLA program
    (out,) = compute(b=B)

    print("mul_mat (4,2)x(3,2) ->", out.shape)
    print(np.asarray(out))
    np.testing.assert_allclose(np.asarray(out), B @ A.T)
    print("OK")


if __name__ == "__main__":
    main()
