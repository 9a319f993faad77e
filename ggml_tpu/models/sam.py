"""Segment Anything (SAM): ViT image encoder + prompt encoder + mask decoder.

Reference: examples/sam/main.cpp (2,233 LoC) — ViT-B encoder with windowed
attention and decomposed relative positions (the GGML_OP_WIN_PART/WIN_UNPART/
GET_REL_POS/ADD_REL_POS ops exist solely for this model, include/ggml.h SAM
helpers), random-fourier prompt encoder, and the two-way transformer mask
decoder with hypernetwork mask heads + IoU head.

Parameter naming follows the HF SamModel state dict (torch parity tests build
a random-init transformers.SamModel and convert in memory). Pixel values are
NCHW fp32 like HF; internal compute uses NHWC where convenient.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class SamVisionCfg:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    image_size: int = 1024
    patch_size: int = 16
    window_size: int = 14
    global_attn_indexes: tuple = (2, 5, 8, 11)
    output_channels: int = 256
    mlp_ratio: float = 4.0
    eps: float = 1e-6


@dataclass(frozen=True)
class SamCfg:
    vision: SamVisionCfg = field(default_factory=SamVisionCfg)
    prompt_hidden: int = 256  # == vision.output_channels == decoder hidden
    image_embedding_size: int = 64
    input_image_size: int = 1024
    dec_layers: int = 2
    dec_heads: int = 8
    dec_downsample: int = 2
    num_multimask: int = 3
    iou_head_hidden: int = 256
    iou_head_depth: int = 3
    eps: float = 1e-6


def cfg_from_hf(hf_cfg) -> SamCfg:
    v = hf_cfg.vision_config
    p = hf_cfg.prompt_encoder_config
    m = hf_cfg.mask_decoder_config
    return SamCfg(
        vision=SamVisionCfg(
            hidden_size=v.hidden_size, num_layers=v.num_hidden_layers,
            num_heads=v.num_attention_heads, image_size=v.image_size,
            patch_size=v.patch_size, window_size=v.window_size,
            global_attn_indexes=tuple(v.global_attn_indexes),
            output_channels=v.output_channels, mlp_ratio=v.mlp_ratio,
            eps=v.layer_norm_eps,
        ),
        prompt_hidden=p.hidden_size,
        image_embedding_size=p.image_embedding_size,
        input_image_size=p.image_size,
        dec_layers=m.num_hidden_layers,
        dec_heads=m.num_attention_heads,
        dec_downsample=m.attention_downsample_rate,
        num_multimask=m.num_multimask_outputs,
        iou_head_hidden=m.iou_head_hidden_dim,
        iou_head_depth=m.iou_head_depth,
        eps=m.layer_norm_eps,
    )


def params_from_hf(model) -> dict:
    """torch SamModel -> {name: np.ndarray} (names = HF state dict keys)."""
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


# --- primitives ---------------------------------------------------------------


def _ln(x, w, b, eps):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.mean((x - m) ** 2, axis=-1, keepdims=True)
    return (x - m) / jnp.sqrt(v + eps) * w + b


def _ln_cf(x, w, b, eps):
    """channels_first LayerNorm over axis 1 of (B, C, H, W) (HF SamLayerNorm)."""
    m = jnp.mean(x, axis=1, keepdims=True)
    v = jnp.mean((x - m) ** 2, axis=1, keepdims=True)
    return (x - m) / jnp.sqrt(v + eps) * w[None, :, None, None] + b[None, :, None, None]


def _lin(p, name, x):
    return x @ p[name + ".weight"].T + p[name + ".bias"]


def _conv_nchw(x, w, b=None, stride=1, padding="VALID"):
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding, dimension_numbers=("NCHW", "OIHW", "NCHW")
    )
    if b is not None:
        y = y + b[None, :, None, None]
    return y


# --- vision encoder -----------------------------------------------------------


def _get_rel_pos(q_size, k_size, rel_pos):
    max_rel = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel:
        rel_pos = jax.image.resize(rel_pos, (max_rel, rel_pos.shape[1]), "linear")
    q_coords = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(np.int32)]


def _vision_attn(p, pre, x, num_heads, eps, use_rel_pos=True):
    """x (B, H, W, C) windowed tokens."""
    b, h, w, c = x.shape
    hd = c // num_heads
    qkv = _lin(p, pre + "qkv", x.reshape(b, h * w, c)).reshape(b, h * w, 3, num_heads, hd)
    qkv = qkv.transpose(2, 0, 3, 1, 4).reshape(3, b * num_heads, h * w, hd)
    q, k, v = qkv[0], qkv[1], qkv[2]
    att = (q * (hd**-0.5)) @ k.transpose(0, 2, 1)
    if use_rel_pos:
        rh = _get_rel_pos(h, h, p[pre + "rel_pos_h"])
        rw = _get_rel_pos(w, w, p[pre + "rel_pos_w"])
        qr = q.reshape(b * num_heads, h, w, hd)
        rel_h = jnp.einsum("bhwc,hkc->bhwk", qr, rh)
        rel_w = jnp.einsum("bhwc,wkc->bhwk", qr, rw)
        att = att + (rel_h[..., :, None] + rel_w[..., None, :]).reshape(att.shape)
    att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = (att @ v).reshape(b, num_heads, h, w, hd).transpose(0, 2, 3, 1, 4).reshape(b, h, w, c)
    return _lin(p, pre + "proj", out)


def _window_partition(x, ws):
    b, h, w, c = x.shape
    ph, pw = (ws - h % ws) % ws, (ws - w % ws) % ws
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws, ws, c), (hp, wp)


def _window_unpartition(win, ws, pad_shape, orig_shape):
    hp, wp = pad_shape
    h, w = orig_shape
    b = win.shape[0] // (hp * wp // ws // ws)
    x = win.reshape(b, hp // ws, wp // ws, ws, ws, -1).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, hp, wp, -1)[:, :h, :w]


def vision_encoder(params, cfg: SamCfg, pixel_values):
    """pixel_values (B, 3, S, S) -> image embeddings (B, out_chans, S/16, S/16)."""
    v = cfg.vision
    p = params
    x = _conv_nchw(
        pixel_values, p["vision_encoder.patch_embed.projection.weight"],
        p["vision_encoder.patch_embed.projection.bias"], stride=v.patch_size,
    ).transpose(0, 2, 3, 1)  # (B, H, W, C)
    if "vision_encoder.pos_embed" in p:
        x = x + p["vision_encoder.pos_embed"]
    for i in range(v.num_layers):
        pre = f"vision_encoder.layers.{i}."
        ws = 0 if i in v.global_attn_indexes else v.window_size
        res = x
        x = _ln(x, p[pre + "layer_norm1.weight"], p[pre + "layer_norm1.bias"], v.eps)
        if ws > 0:
            h0, w0 = x.shape[1], x.shape[2]
            x, pad_shape = _window_partition(x, ws)
        x = _vision_attn(p, pre + "attn.", x, v.num_heads, v.eps)
        if ws > 0:
            x = _window_unpartition(x, ws, pad_shape, (h0, w0))
        x = res + x
        h2 = _ln(x, p[pre + "layer_norm2.weight"], p[pre + "layer_norm2.bias"], v.eps)
        h2 = _lin(p, pre + "mlp.lin1", h2)
        h2 = jax.nn.gelu(h2, approximate=False)
        x = x + _lin(p, pre + "mlp.lin2", h2)
    # neck
    x = x.transpose(0, 3, 1, 2)
    x = _conv_nchw(x, p["vision_encoder.neck.conv1.weight"])
    x = _ln_cf(x, p["vision_encoder.neck.layer_norm1.weight"], p["vision_encoder.neck.layer_norm1.bias"], v.eps)
    x = _conv_nchw(x, p["vision_encoder.neck.conv2.weight"], padding="SAME")
    x = _ln_cf(x, p["vision_encoder.neck.layer_norm2.weight"], p["vision_encoder.neck.layer_norm2.bias"], v.eps)
    return x


# --- prompt encoder -----------------------------------------------------------


def _fourier_pe(params, coords):
    """coords in [0,1]^2, any leading shape -> (..., hidden)."""
    pe = params["shared_image_embedding.positional_embedding"]
    c = 2 * coords - 1
    c = c @ pe
    c = 2 * np.pi * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


def image_wide_pe(params, cfg: SamCfg):
    size = cfg.image_embedding_size
    grid = np.ones((size, size), np.float32)
    y = (grid.cumsum(0) - 0.5) / size
    x = (grid.cumsum(1) - 0.5) / size
    pe = _fourier_pe(params, jnp.asarray(np.stack([x, y], -1)))
    return pe.transpose(2, 0, 1)[None]  # (1, C, H, W)


def prompt_encoder(params, cfg: SamCfg, input_points, input_labels):
    """points (B, P, N, 2) in input-image pixels, labels (B, P, N).
    Returns (sparse (B, P, N+1, C), dense (B, C, s, s))."""
    p = params
    pts = input_points + 0.5
    b, pb, n, _ = pts.shape
    pts = jnp.concatenate([pts, jnp.zeros((b, pb, 1, 2))], axis=2)
    labels = jnp.concatenate([input_labels, -jnp.ones((b, pb, 1))], axis=2)
    coords = pts / cfg.input_image_size
    pe = _fourier_pe(p, coords)
    pe = jnp.where(labels[..., None] == -1, p["prompt_encoder.not_a_point_embed.weight"][0], pe)
    pe = jnp.where((labels == 0)[..., None], pe + p["prompt_encoder.point_embed.0.weight"][0], pe)
    pe = jnp.where((labels == 1)[..., None], pe + p["prompt_encoder.point_embed.1.weight"][0], pe)
    s = cfg.image_embedding_size
    dense = jnp.broadcast_to(
        p["prompt_encoder.no_mask_embed.weight"].reshape(1, -1, 1, 1), (b, cfg.prompt_hidden, s, s)
    )
    return pe, dense


# --- mask decoder -------------------------------------------------------------


def _dec_attn(p, pre, q, k, v, num_heads):
    """q/k/v (B, P, T, C) -> (B, P, T, C) with optional internal downsample."""
    qp = _lin(p, pre + "q_proj", q)
    kp = _lin(p, pre + "k_proj", k)
    vp = _lin(p, pre + "v_proj", v)
    b, pb, t, ci = qp.shape
    hd = ci // num_heads

    def heads(z):
        return z.reshape(b * pb, z.shape[2], num_heads, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = heads(qp), heads(kp), heads(vp)
    att = (qh * (hd**-0.5)) @ kh.transpose(0, 1, 3, 2)
    att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(qh.dtype)
    out = (att @ vh).transpose(0, 2, 1, 3).reshape(b, pb, -1, ci)
    return _lin(p, pre + "out_proj", out)


def _dec_mlp(p, pre, x, act=jax.nn.relu, sigmoid_out=False, depth=3):
    x = act(_lin(p, pre + "proj_in", x))
    for i in range(depth - 2):
        x = act(_lin(p, pre + f"layers.{i}", x))
    x = _lin(p, pre + "proj_out", x)
    return jax.nn.sigmoid(x) if sigmoid_out else x


def mask_decoder(params, cfg: SamCfg, image_embeddings, image_pe, sparse, dense, multimask=True):
    p = params
    b, c, h, w = image_embeddings.shape
    pb = sparse.shape[1]
    nm = cfg.num_multimask + 1

    out_tokens = jnp.concatenate(
        [p["mask_decoder.iou_token.weight"], p["mask_decoder.mask_tokens.weight"]], axis=0
    )
    out_tokens = jnp.broadcast_to(out_tokens[None, None], (b, pb, nm + 1, c))
    tokens = jnp.concatenate([out_tokens, sparse], axis=2)

    img = (image_embeddings + dense).reshape(b, c, h * w).transpose(0, 2, 1)
    img = jnp.broadcast_to(img[:, None], (b, pb, h * w, c))
    pe_img = image_pe.reshape(1, c, h * w).transpose(0, 2, 1)
    pe_img = jnp.broadcast_to(pe_img[:, None], (b, pb, h * w, c))

    queries, keys = tokens, img
    for i in range(cfg.dec_layers):
        pre = f"mask_decoder.transformer.layers.{i}."
        if i == 0:  # skip_first_layer_pe: plain assignment, no residual, no PE
            queries = _dec_attn(p, pre + "self_attn.", queries, queries, queries, cfg.dec_heads)
        else:
            q_in = queries + tokens
            queries = queries + _dec_attn(p, pre + "self_attn.", q_in, q_in, queries, cfg.dec_heads)
        queries = _ln(queries, p[pre + "layer_norm1.weight"], p[pre + "layer_norm1.bias"], cfg.eps)

        q_in = queries + tokens
        k_in = keys + pe_img
        queries = queries + _dec_attn(p, pre + "cross_attn_token_to_image.", q_in, k_in, keys, cfg.dec_heads)
        queries = _ln(queries, p[pre + "layer_norm2.weight"], p[pre + "layer_norm2.bias"], cfg.eps)

        mlp = _lin(p, pre + "mlp.lin2", jax.nn.relu(_lin(p, pre + "mlp.lin1", queries)))
        queries = _ln(queries + mlp, p[pre + "layer_norm3.weight"], p[pre + "layer_norm3.bias"], cfg.eps)

        q_in = queries + tokens
        k_in = keys + pe_img
        keys = keys + _dec_attn(p, pre + "cross_attn_image_to_token.", k_in, q_in, queries, cfg.dec_heads)
        keys = _ln(keys, p[pre + "layer_norm4.weight"], p[pre + "layer_norm4.bias"], cfg.eps)

    q_in = queries + tokens
    k_in = keys + pe_img
    queries = queries + _dec_attn(p, "mask_decoder.transformer.final_attn_token_to_image.", q_in, k_in, keys, cfg.dec_heads)
    queries = _ln(
        queries,
        p["mask_decoder.transformer.layer_norm_final_attn.weight"],
        p["mask_decoder.transformer.layer_norm_final_attn.bias"],
        cfg.eps,
    )

    iou_token_out = queries[:, :, 0]
    mask_tokens_out = queries[:, :, 1 : 1 + nm]

    img_dec = keys.transpose(0, 1, 3, 2).reshape(b * pb, c, h, w)
    up = jax.lax.conv_transpose(
        img_dec, p["mask_decoder.upscale_conv1.weight"], (2, 2), "VALID",
        dimension_numbers=("NCHW", "IOHW", "NCHW"),
    ) + p["mask_decoder.upscale_conv1.bias"][None, :, None, None]
    up = _ln_cf(up, p["mask_decoder.upscale_layer_norm.weight"], p["mask_decoder.upscale_layer_norm.bias"], cfg.eps)
    up = jax.nn.gelu(up, approximate=False)
    up = jax.lax.conv_transpose(
        up, p["mask_decoder.upscale_conv2.weight"], (2, 2), "VALID",
        dimension_numbers=("NCHW", "IOHW", "NCHW"),
    ) + p["mask_decoder.upscale_conv2.bias"][None, :, None, None]
    up = jax.nn.gelu(up, approximate=False)

    hyper = jnp.stack(
        [
            _dec_mlp(p, f"mask_decoder.output_hypernetworks_mlps.{i}.", mask_tokens_out[:, :, i])
            for i in range(nm)
        ],
        axis=2,
    )  # (B, P, nm, c/8)
    _, cu, hu, wu = up.shape
    upf = up.reshape(b, pb, cu, hu * wu)
    masks = jnp.einsum("bpnc,bpcl->bpnl", hyper, upf).reshape(b, pb, nm, hu, wu)

    iou = _dec_mlp(p, "mask_decoder.iou_prediction_head.", iou_token_out, depth=cfg.iou_head_depth)
    sl = slice(1, None) if multimask else slice(0, 1)
    return masks[:, :, sl], iou[:, :, sl]


def forward(params, cfg: SamCfg, pixel_values, input_points, input_labels, multimask=True):
    """Full SAM: returns (pred_masks (B, P, nm, 4s, 4s), iou_scores (B, P, nm))."""
    img = vision_encoder(params, cfg, pixel_values)
    pe = image_wide_pe(params, cfg)
    sparse, dense = prompt_encoder(params, cfg, input_points, input_labels)
    return mask_decoder(params, cfg, img, pe, sparse, dense, multimask)
