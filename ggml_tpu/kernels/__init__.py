"""Pallas TPU kernels: the hot compute paths.

Analogous to the reference's hand-optimized backend kernels
(src/ggml-cuda/*.cu, src/ggml-cpu/ggml-cpu-quants.c), re-designed for the
TPU MXU/VPU + VMEM hierarchy instead of being translated.
"""

from .qmatmul import planar_matmul  # noqa: F401
