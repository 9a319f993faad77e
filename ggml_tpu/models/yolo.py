"""YOLOv3-tiny object detection.

Reference: examples/yolo/yolov3-tiny.cpp — 13 conv layers (batch-norm folded
at inference: sub mean / div sqrt var / mul scale / add bias, :198-210), leaky
relu 0.1, maxpools (incl. the stride-1 'same' pool before layer 6, :449),
x2 nearest upsample + route concat (:464-468), two YOLO heads decoding
anchor boxes (:221-250, get_yolo_box :232) and class-probability NMS (:325+).

Layout: NHWC images in [0,1]; weights HWIO.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

# conv filter plan (darknet yolov3-tiny.cfg, mirrored by the reference loader)
# (filters, kernel, batch_norm+leaky?)  index matches conv2d_layers[i]
_CONVS = [
    (16, 3, True), (32, 3, True), (64, 3, True), (128, 3, True),
    (256, 3, True), (512, 3, True), (1024, 3, True),
    (256, 1, True), (512, 3, True), (255, 1, False),
    (128, 1, True), (256, 3, True), (255, 1, False),
]
ANCHORS = [10, 14, 23, 27, 37, 58, 81, 82, 135, 169, 344, 319]
MASK16 = [3, 4, 5]
MASK23 = [0, 1, 2]
N_CLASSES = 80
NET_W = NET_H = 416


# input channels per conv (from the network wiring in forward())
_CIN = [3, 16, 32, 64, 128, 256, 512, 1024, 256, 512, 256, 128 + 256, 256]


def init_random_params(seed: int = 0):
    rng = np.random.default_rng(seed)
    p = {}
    for i, (cout, k, bn) in enumerate(_CONVS):
        cin = _CIN[i]
        p[f"l{i}_weights"] = jnp.asarray(
            (rng.standard_normal((k, k, cin, cout)) * np.sqrt(2.0 / (k * k * cin))).astype(np.float32)
        )
        p[f"l{i}_biases"] = jnp.zeros((cout,), jnp.float32)
        if bn:
            p[f"l{i}_scales"] = jnp.ones((cout,), jnp.float32)
            p[f"l{i}_mean"] = jnp.zeros((cout,), jnp.float32)
            p[f"l{i}_var"] = jnp.ones((cout,), jnp.float32)
    return p


def load_gguf(path):
    """Load a yolov3-tiny GGUF (reference tensor naming: l{i}_weights OIHW
    f16, l{i}_biases / _scales / _rolling_mean / _rolling_variance;
    reference loader examples/yolo/yolov3-tiny.cpp:84-160 and converter
    convert-yolov3-tiny.py).  Files produced by tools/convert_darknet_yolo.py
    or the reference converter both load."""
    from ..gguf import GGUFFile

    g = GGUFFile(path)
    p = {}
    for i, (cout, k, bn) in enumerate(_CONVS):
        wt = g.to_float32(f"l{i}_weights").reshape(cout, _CIN[i], k, k)
        p[f"l{i}_weights"] = jnp.asarray(wt.transpose(2, 3, 1, 0))  # OIHW -> HWIO
        p[f"l{i}_biases"] = jnp.asarray(g.to_float32(f"l{i}_biases").reshape(cout))
        if bn:
            p[f"l{i}_scales"] = jnp.asarray(g.to_float32(f"l{i}_scales").reshape(cout))
            p[f"l{i}_mean"] = jnp.asarray(g.to_float32(f"l{i}_rolling_mean").reshape(cout))
            p[f"l{i}_var"] = jnp.asarray(g.to_float32(f"l{i}_rolling_variance").reshape(cout))
    return p


def _conv(x, p, i, padding="SAME"):
    cout, k, bn = _CONVS[i]
    y = jax.lax.conv_general_dilated(
        x, p[f"l{i}_weights"], (1, 1), padding, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    if bn:
        y = (y - p[f"l{i}_mean"]) / jnp.sqrt(p[f"l{i}_var"])
        y = y * p[f"l{i}_scales"]
    y = y + p[f"l{i}_biases"]
    if bn:  # activate flag == batch_normalize for all 13 layers in the cfg
        y = jnp.where(y > 0, y, 0.1 * y)
    return y


def _maxpool(x, stride=2, same=False):
    if same:  # pool 2x2 stride 1, pad 0.5 -> pad bottom/right by 1
        pads = ((0, 0), (0, 1), (0, 1), (0, 0))
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 1, 1, 1), pads)
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, stride, stride, 1), "VALID")


def forward(params, images):
    """images (b, 416, 416, 3) -> (head16 (b,13,13,255), head23 (b,26,26,255)).
    reference: evaluate_network graph (yolov3-tiny.cpp:430-472)."""
    x = images
    x = _conv(x, params, 0); x = _maxpool(x)
    x = _conv(x, params, 1); x = _maxpool(x)
    x = _conv(x, params, 2); x = _maxpool(x)
    x = _conv(x, params, 3); x = _maxpool(x)
    x = _conv(x, params, 4)
    layer_8 = x  # route source (256ch, 26x26)
    x = _maxpool(x)
    x = _conv(x, params, 5)
    x = _maxpool(x, same=True)
    x = _conv(x, params, 6)
    x = _conv(x, params, 7)
    layer_13 = x  # 256ch 13x13
    x = _conv(x, params, 8)
    head16 = _conv(x, params, 9)  # 255ch 13x13, linear

    x = _conv(layer_13, params, 10)  # 128ch 1x1
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # x2 nearest upsample
    x = jnp.concatenate([x, layer_8], axis=-1)
    x = _conv(x, params, 11)
    head23 = _conv(x, params, 12)  # 255ch 26x26, linear
    return head16, head23


# --- detection post-processing (host-side numpy, reference :221-340) ---------


@dataclass
class Detection:
    box: tuple  # (x, y, w, h) normalized center format
    objectness: float
    prob: np.ndarray = field(default_factory=lambda: np.zeros(N_CLASSES))


def decode_head(pred: np.ndarray, mask, thresh=0.5, net_w=NET_W, net_h=NET_H):
    """pred (h, w, 255) one image -> detections, vectorized over the grid
    (the reference iterates cells in C: apply_yolo + get_yolo_detections,
    yolov3-tiny.cpp:221-294; a Python per-cell loop costs seconds)."""
    h, w, _ = pred.shape
    na = len(mask)
    v = pred.reshape(h, w, na, 4 + 1 + N_CLASSES).astype(np.float32)
    sig = lambda z: 1.0 / (1.0 + np.exp(-z))
    obj = sig(v[..., 4])  # (h, w, na)
    rows, cols, ns = np.nonzero(obj > thresh)
    dets = []
    if len(rows) == 0:
        return dets
    sel = v[rows, cols, ns]  # (K, 85)
    anchors_w = np.array([ANCHORS[2 * m] for m in mask], np.float32)[ns]
    anchors_h = np.array([ANCHORS[2 * m + 1] for m in mask], np.float32)[ns]
    bx = (cols + sig(sel[:, 0])) / w
    by = (rows + sig(sel[:, 1])) / h
    bw = np.exp(sel[:, 2]) * anchors_w / net_w
    bh = np.exp(sel[:, 3]) * anchors_h / net_h
    objs = obj[rows, cols, ns]
    probs = objs[:, None] * sig(sel[:, 5:])
    probs[probs <= thresh] = 0.0
    for i in range(len(rows)):
        dets.append(
            Detection((float(bx[i]), float(by[i]), float(bw[i]), float(bh[i])),
                      float(objs[i]), probs[i])
        )
    return dets


def _iou_vec(a, boxes):
    """IoU of box a (4,) against boxes (K, 4), center format."""
    w = np.minimum(a[0] + a[2] / 2, boxes[:, 0] + boxes[:, 2] / 2) - np.maximum(
        a[0] - a[2] / 2, boxes[:, 0] - boxes[:, 2] / 2
    )
    h = np.minimum(a[1] + a[3] / 2, boxes[:, 1] + boxes[:, 3] / 2) - np.maximum(
        a[1] - a[3] / 2, boxes[:, 1] - boxes[:, 3] / 2
    )
    inter = np.where((w < 0) | (h < 0), 0.0, w * h)
    union = a[2] * a[3] + boxes[:, 2] * boxes[:, 3] - inter
    return np.where(union > 0, inter / np.where(union > 0, union, 1.0), 0.0)


def nms(dets: list, thresh=0.45):
    """reference: do_nms_sort (yolov3-tiny.cpp:325-345) — same greedy
    class-wise suppression, with the inner IoU row vectorized (the per-pair
    Python loop is quadratic in detections)."""
    if not dets:
        return dets
    boxes = np.array([d.box for d in dets], np.float32)
    probs = np.stack([d.prob for d in dets]).astype(np.float32)
    for k in range(N_CLASSES):
        order = np.argsort(-probs[:, k], kind="stable")
        for ii, i in enumerate(order):
            if probs[i, k] == 0:
                continue
            rest = order[ii + 1 :]
            if len(rest) == 0:
                continue
            kill = rest[_iou_vec(boxes[i], boxes[rest]) > thresh]
            probs[kill, k] = 0.0
    for d, p in zip(dets, probs):
        d.prob = p
    return dets


_forward_jit = None


def detect(params, images: np.ndarray, thresh=0.5, nms_thresh=0.45):
    global _forward_jit
    if _forward_jit is None:  # one persistent jit wrapper: no per-call retrace
        _forward_jit = jax.jit(forward)
    h16, h23 = _forward_jit(params, jnp.asarray(images))
    out = []
    for b in range(images.shape[0]):
        dets = decode_head(np.asarray(h16)[b], MASK16, thresh)
        dets += decode_head(np.asarray(h23)[b], MASK23, thresh)
        out.append(nms(dets, nms_thresh))
    return out
