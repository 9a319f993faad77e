"""Darknet yolov3-tiny.weights -> GGUF (the analog of the reference's
examples/yolo/convert-yolov3-tiny.py; same tensor names and ne shapes, so the
output is interchangeable with reference-produced yolov3-tiny.gguf files).

Darknet layout: 20-byte header, then per conv layer
[biases (f)] [bn: scales (f), rolling_mean (f), rolling_variance (f)]
[weights (f*c*s*s)] as little-endian f32 (darknet src/parser.c).

Usage: python tools/convert_darknet_yolo.py yolov3-tiny.weights out.gguf
"""

import sys

sys.path.insert(0, ".")
import numpy as np

from ggml_tpu.dtypes import GGMLType
from ggml_tpu.gguf import GGUFWriter
from ggml_tpu.models.yolo import _CIN, _CONVS


def convert(weights_path, out_path):
    w = GGUFWriter()
    w.add_string("general.architecture", "yolov3-tiny")
    with open(weights_path, "rb") as f:
        f.read(20)  # major/minor/revision + seen counter
        for i, (filters, size, bn) in enumerate(_CONVS):
            in_c = _CIN[i]  # route/upsample wiring: NOT the previous filters
            biases = np.fromfile(f, np.float32, filters)
            w.add_tensor(f"l{i}_biases", biases, GGMLType.F32,
                         raw_shape_ne=(1, 1, filters, 1))
            if bn:
                for suffix in ("scales", "rolling_mean", "rolling_variance"):
                    v = np.fromfile(f, np.float32, filters)
                    w.add_tensor(f"l{i}_{suffix}", v, GGMLType.F32,
                                 raw_shape_ne=(1, 1, filters, 1))
            n = filters * in_c * size * size
            conv = np.fromfile(f, np.float32, n)
            if len(conv) != n:
                raise ValueError(f"truncated weights file at layer {i}")
            # reference stores OIHW f16 with ne (s, s, in, filters)
            w.add_tensor(
                f"l{i}_weights",
                conv.astype(np.float16).reshape(filters, in_c, size, size),
                GGMLType.F16,
                raw_shape_ne=(size, size, in_c, filters),
            )
    w.write(out_path)
    return out_path


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    convert(sys.argv[1], sys.argv[2])
    print(f"{sys.argv[1]} -> {sys.argv[2]}")
