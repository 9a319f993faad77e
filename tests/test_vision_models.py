"""YOLOv3-tiny + Magika model tests: shape/topology conformance with the
reference graphs and numeric sanity (reference: examples/yolo/yolov3-tiny.cpp
evaluate_network, examples/magika/main.cpp magika_graph)."""

import numpy as np

import jax
import jax.numpy as jnp

from ggml_tpu.models import magika, yolo


def test_yolo_head_shapes_and_detect():
    params = yolo.init_random_params(0)
    img = np.random.default_rng(0).random((1, 416, 416, 3)).astype(np.float32)
    h16, h23 = jax.jit(yolo.forward)(params, jnp.asarray(img))
    assert h16.shape == (1, 13, 13, 255)
    assert h23.shape == (1, 26, 26, 255)
    assert np.isfinite(np.asarray(h16)).all() and np.isfinite(np.asarray(h23)).all()
    dets = yolo.detect(params, img, thresh=0.5)
    assert isinstance(dets[0], list)  # random weights: any count is fine


def test_yolo_nms_suppresses_overlaps():
    a = yolo.Detection((0.5, 0.5, 0.2, 0.2), 0.9, np.zeros(yolo.N_CLASSES))
    b = yolo.Detection((0.5, 0.5, 0.21, 0.21), 0.8, np.zeros(yolo.N_CLASSES))
    c = yolo.Detection((0.1, 0.1, 0.05, 0.05), 0.7, np.zeros(yolo.N_CLASSES))
    a.prob[3] = 0.9
    b.prob[3] = 0.8  # heavy overlap with a -> suppressed
    c.prob[3] = 0.7  # disjoint -> kept
    out = yolo.nms([a, b, c], thresh=0.45)
    assert out[0].prob[3] == 0.9 and out[1].prob[3] == 0.0 and out[2].prob[3] == 0.7


def test_magika_forward_and_features():
    params = magika.init_random_params(0)
    data = bytes(range(256)) * 10
    feats = magika.file_features(data)
    assert feats.shape == (1536, 257)
    assert (feats.sum(-1) == 1).all()  # proper one-hot incl. pad symbol
    short = magika.file_features(b"PK")
    assert short[2:512, 256].all()  # padded with symbol 256

    probs = jax.jit(magika.forward)(params, jnp.asarray(feats[None]))
    assert probs.shape == (1, magika.N_LABEL)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-5)
