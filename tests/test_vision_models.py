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


def test_darknet_convert_and_load(tmp_path):
    """Synthesized darknet .weights -> GGUF (reference tensor naming) ->
    load_gguf -> forward runs; values survive the round trip (f16 weights)."""
    import struct

    import jax.numpy as jnp

    sys_path = str(__import__("pathlib").Path(__file__).resolve().parent.parent)
    import sys

    if sys_path not in sys.path:
        sys.path.insert(0, sys_path)
    from tools.convert_darknet_yolo import convert

    rng = np.random.default_rng(3)
    wpath = tmp_path / "fake.weights"
    with open(wpath, "wb") as f:
        f.write(struct.pack("<iiiq", 0, 2, 0, 0))  # 20-byte darknet header
        for i, (cout, k, bn) in enumerate(yolo._CONVS):
            cin = yolo._CIN[i]
            f.write((rng.standard_normal(cout) * 0.1).astype(np.float32).tobytes())
            if bn:
                for _ in range(3):
                    f.write((rng.random(cout).astype(np.float32) + 0.5).tobytes())
            f.write((rng.standard_normal(cout * cin * k * k) * 0.05).astype(np.float32).tobytes())
    gpath = tmp_path / "fake.gguf"
    convert(str(wpath), str(gpath))
    params = yolo.load_gguf(str(gpath))
    assert params["l0_weights"].shape == (3, 3, 3, 16)
    assert params["l11_weights"].shape == (3, 3, 384, 256)
    img = jnp.asarray(rng.random((1, 416, 416, 3)).astype(np.float32))
    h16, h23 = jax.jit(yolo.forward)(params, img)
    assert h16.shape == (1, 13, 13, 255) and h23.shape == (1, 26, 26, 255)
    assert np.isfinite(np.asarray(h16)).all()


def test_magika_gguf_roundtrip(tmp_path):
    """Random params -> reference-named GGUF -> load_gguf reproduces the same
    forward probabilities (kernel transpose convention of the reference
    converter, examples/magika/convert.py)."""
    import jax.numpy as jnp

    from ggml_tpu.gguf import GGUFWriter

    params = magika.init_random_params(seed=5)
    name_map = {
        "layer_norm/gamma": "layer_normalization/gamma",
        "layer_norm/beta": "layer_normalization/beta",
        "layer_norm_1/gamma": "layer_normalization_1/gamma",
        "layer_norm_1/beta": "layer_normalization_1/beta",
    }
    w = GGUFWriter()
    for k, v in params.items():
        arr = np.asarray(v)
        if arr.ndim == 2:
            arr = arr.T.copy()  # the reference converter stores kernels transposed
        w.add_tensor(name_map.get(k, k) + ":0", arr)
    path = tmp_path / "magika.gguf"
    w.write(path)

    loaded = magika.load_gguf(str(path))
    feats = np.stack([magika.file_features(b"hello world magika")])
    a = np.asarray(magika.forward(params, jnp.asarray(feats)))
    b = np.asarray(magika.forward(loaded, jnp.asarray(feats)))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)
