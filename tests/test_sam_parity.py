"""SAM parity: random-init HF SamModel vs our jax implementation — vision
encoder (windowed attention + decomposed rel-pos), prompt encoder, two-way
mask decoder (the reference's examples/sam/main.cpp pipeline)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from ggml_tpu.models import sam as jsam


@pytest.fixture(scope="module")
def tiny_sam():
    cfg = transformers.SamConfig(
        vision_config=dict(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            image_size=64, patch_size=8, window_size=2, global_attn_indexes=[1],
            output_channels=16, num_channels=3, use_abs_pos=True, use_rel_pos=True,
            mlp_dim=64, num_pos_feats=8,  # fourier PE dim = prompt hidden / 2
        ),
        prompt_encoder_config=dict(
            hidden_size=16, image_embedding_size=8, image_size=64, patch_size=8,
        ),
        mask_decoder_config=dict(
            hidden_size=16, num_attention_heads=2, num_hidden_layers=2,
            iou_head_depth=3, iou_head_hidden_dim=32, attention_downsample_rate=2,
        ),
    )
    torch.manual_seed(17)
    model = transformers.SamModel(cfg)
    model.eval()
    # rel_pos params init to zeros; randomize so the rel-pos path is exercised
    with torch.no_grad():
        for n, t in model.named_parameters():
            if "rel_pos" in n or "pos_embed" in n:
                t.copy_(torch.randn_like(t) * 0.02)
    return model, cfg


def test_sam_vision_encoder_parity(tiny_sam):
    model, cfg = tiny_sam
    params = {k: jnp.asarray(v) for k, v in jsam.params_from_hf(model).items()}
    jcfg = jsam.cfg_from_hf(cfg)

    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        hf_emb = model.vision_encoder(torch.tensor(pixels)).last_hidden_state.numpy()
    ours = np.asarray(jsam.vision_encoder(params, jcfg, jnp.asarray(pixels)))
    np.testing.assert_allclose(ours, hf_emb, rtol=2e-4, atol=2e-4)


def test_sam_full_parity(tiny_sam):
    model, cfg = tiny_sam
    params = {k: jnp.asarray(v) for k, v in jsam.params_from_hf(model).items()}
    jcfg = jsam.cfg_from_hf(cfg)

    rng = np.random.default_rng(1)
    pixels = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    points = np.array([[[[40.0, 20.0]]]], np.float32)  # (B, P, N, 2)
    labels = np.ones((1, 1, 1), np.float32)

    with torch.no_grad():
        out = model(
            pixel_values=torch.tensor(pixels),
            input_points=torch.tensor(points),
            input_labels=torch.tensor(labels, dtype=torch.long),
            multimask_output=True,
        )
    hf_masks = out.pred_masks.numpy()
    hf_iou = out.iou_scores.numpy()

    masks, iou = jsam.forward(
        params, jcfg, jnp.asarray(pixels), jnp.asarray(points), jnp.asarray(labels)
    )
    assert masks.shape == hf_masks.shape
    np.testing.assert_allclose(np.asarray(iou), hf_iou, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(masks), hf_masks, rtol=2e-3, atol=2e-3)
