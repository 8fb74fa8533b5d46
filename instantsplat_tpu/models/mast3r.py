"""MASt3R / DUSt3R pointmap transformer in pure JAX.

TPU-native re-implementation of `AsymmetricMASt3R` (mast3r/model.py:40-68 ->
dust3r/model.py:55-210) and the croco-v2 ViT it builds on. The croco
submodule is empty in the reference snapshot; the block/RoPE/DPT structure
below follows the public CroCo-v2 / DPT architecture as constrained by the
reference call sites (hooks, dims, head factories).

Architecture (MASt3R ViT-Large checkpoint configuration):
- siamese encoder: patch 16 conv embed -> 24 pre-norm transformer blocks,
  dim 1024 / 16 heads, 2D RoPE (freq 100) on q,k — the per-head channel
  dim is split in half, the first half rotated by the patch's y index and
  the second by x, each with standard rotate-half RoPE;
- two decoders (dec_blocks for view 1, dec_blocks2 for view 2 —
  dust3r/model.py:71 deepcopy + 90-97 checkpoint duplication rule):
  12 blocks, dim 768 / 12 heads; each block = self-attn (RoPE), cross-attn
  to the OTHER view's previous-layer tokens (RoPE on q and k), MLP; the
  cross-attended memory is re-normed per block (norm_y);
- heads (mast3r/catmlp_dpt_head.py:99-123 'catmlp+dpt', output
  'pts3d+desc24'): a DPT pyramid over [enc_out, dec6, dec9, dec12] hooks
  producing 3+1 channels at full resolution, plus an MLP over
  cat(enc_out, dec12) pixel-shuffled to 24-dim local descriptors with
  their own confidence (two_confs);
- postprocess (dust3r/heads/postprocess.py + catmlp reg_desc): pts3d =
  dir * expm1(|xyz|), conf = 1 + exp(x), desc L2-normalized.

All functions are jit-friendly over [B, H, W, 3] image batches in [0, 1]
(the DUSt3R ImgNorm x*2-1 is applied internally). Portrait images are
processed directly in their true orientation — numerically equal to the
reference's ManyAR/transpose_to_landscape scheme, which also evaluates
portrait views at their true shape and merely stores them transposed in
landscape buffers (dust3r/patch_embed.py:32-70, dust3r/utils/misc.py:
54-96; equivariance locked by tests/test_mast3r.py). Mixed-aspect image
sets go through models.mast3r_infer.infer_pairs_mixed (shape-grouped
batching replacing the reference's forced batch_size=1,
dust3r/inference.py:62-64).

Parameters are a plain nested dict pytree. `init_params` gives a random
model (tests); `convert_torch_checkpoint` maps a MASt3R .pth state_dict
into the same tree.
"""

from __future__ import annotations

import dataclasses
import math
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class MASt3RConfig:
    patch_size: int = 16
    enc_embed_dim: int = 1024
    enc_depth: int = 24
    enc_num_heads: int = 16
    dec_embed_dim: int = 768
    dec_depth: int = 12
    dec_num_heads: int = 12
    mlp_ratio: int = 4
    rope_freq: float = 100.0
    local_feat_dim: int = 24
    two_confs: bool = True
    dpt_feature_dim: int = 256
    dpt_last_dim: int = 128
    dpt_layer_dims: tuple = (96, 192, 384, 768)
    ln_eps: float = 1e-6

    @property
    def dpt_hooks(self):
        l2 = self.dec_depth
        return (0, l2 * 2 // 4, l2 * 3 // 4, l2)

    @property
    def dpt_dim_tokens(self):
        return (self.enc_embed_dim, self.dec_embed_dim,
                self.dec_embed_dim, self.dec_embed_dim)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _layer_norm(p, x, eps):
    # statistics in f32 even under bf16 inference (standard mixed precision)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    return out.astype(x.dtype)


def _linear(p, x):
    return x @ p["w"] + p["b"]


def _mlp(p, x, eps):
    h = jax.nn.gelu(_linear(p["fc1"], x), approximate=False)
    return _linear(p["fc2"], h)


def _rope_cos_sin(positions, dim_half, freq):
    """positions [B,S] int -> (cos, sin) [B,S,dim_half] for rotate-half."""
    d4 = dim_half // 2
    inv = 1.0 / (freq ** (jnp.arange(0, d4, dtype=jnp.float32) * 2 / dim_half))
    ang = positions[..., None].astype(jnp.float32) * inv  # [B,S,d4]
    ang = jnp.concatenate([ang, ang], -1)  # [B,S,dim_half]
    return jnp.cos(ang), jnp.sin(ang)


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], -1)


def _apply_rope2d(tokens, pos, freq):
    """tokens [B, heads, S, hd]; pos [B, S, 2] (y, x) patch indices."""
    hd = tokens.shape[-1]
    dt = tokens.dtype
    y_tok, x_tok = jnp.split(tokens, 2, axis=-1)
    cos_y, sin_y = _rope_cos_sin(pos[..., 0], hd // 2, freq)
    cos_x, sin_x = _rope_cos_sin(pos[..., 1], hd // 2, freq)
    # angles are computed in f32; apply in the token dtype (bf16 inference)
    cos_y, sin_y = cos_y[:, None].astype(dt), sin_y[:, None].astype(dt)
    cos_x, sin_x = cos_x[:, None].astype(dt), sin_x[:, None].astype(dt)
    y_tok = y_tok * cos_y + _rotate_half(y_tok) * sin_y
    x_tok = x_tok * cos_x + _rotate_half(x_tok) * sin_x
    return jnp.concatenate([y_tok, x_tok], -1)


def _heads_split(x, n_heads):
    b, s, d = x.shape
    return x.reshape(b, s, n_heads, d // n_heads).transpose(0, 2, 1, 3)


def _heads_merge(x):
    b, h, s, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * hd)


def _attention(q, k, v):
    hd = q.shape[-1]
    att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd)
    att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", att, v)


def _self_attn(p, x, pos, n_heads, freq):
    qkv = _linear(p["qkv"], x)  # [B,S,3D]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = _apply_rope2d(_heads_split(q, n_heads), pos, freq)
    k = _apply_rope2d(_heads_split(k, n_heads), pos, freq)
    v = _heads_split(v, n_heads)
    out = _heads_merge(_attention(q, k, v))
    return _linear(p["proj"], out)


def _cross_attn(p, x, y, xpos, ypos, n_heads, freq):
    q = _apply_rope2d(_heads_split(_linear(p["projq"], x), n_heads),
                      xpos, freq)
    k = _apply_rope2d(_heads_split(_linear(p["projk"], y), n_heads),
                      ypos, freq)
    v = _heads_split(_linear(p["projv"], y), n_heads)
    out = _heads_merge(_attention(q, k, v))
    return _linear(p["proj"], out)


def _enc_block(p, x, pos, cfg: MASt3RConfig):
    x = x + _self_attn(p["attn"], _layer_norm(p["norm1"], x, cfg.ln_eps),
                       pos, cfg.enc_num_heads, cfg.rope_freq)
    x = x + _mlp(p["mlp"], _layer_norm(p["norm2"], x, cfg.ln_eps), cfg.ln_eps)
    return x


def _dec_block(p, x, y, xpos, ypos, cfg: MASt3RConfig):
    """croco DecoderBlock: self-attn, cross-attn to normed memory, MLP."""
    x = x + _self_attn(p["attn"], _layer_norm(p["norm1"], x, cfg.ln_eps),
                       xpos, cfg.dec_num_heads, cfg.rope_freq)
    y_ = _layer_norm(p["norm_y"], y, cfg.ln_eps)
    x = x + _cross_attn(p["cross_attn"],
                        _layer_norm(p["norm2"], x, cfg.ln_eps),
                        y_, xpos, ypos, cfg.dec_num_heads, cfg.rope_freq)
    x = x + _mlp(p["mlp"], _layer_norm(p["norm3"], x, cfg.ln_eps), cfg.ln_eps)
    return x


# ---------------------------------------------------------------------------
# patch embed + encoder / decoder stacks
# ---------------------------------------------------------------------------


def patch_positions(h_patches, w_patches, batch):
    gy, gx = jnp.meshgrid(jnp.arange(h_patches), jnp.arange(w_patches),
                          indexing="ij")
    pos = jnp.stack([gy, gx], -1).reshape(-1, 2)
    return jnp.tile(pos[None], (batch, 1, 1))


def encode_images(params, cfg: MASt3RConfig, images):
    """images [B, H, W, 3] in [0,1] -> (tokens [B,S,D], pos [B,S,2])."""
    b, h, w, _ = images.shape
    assert h % cfg.patch_size == 0 and w % cfg.patch_size == 0
    # NOTE orientation: the reference's ManyAR_PatchEmbed /
    # transpose_to_landscape machinery (dust3r/patch_embed.py:32-70,
    # dust3r/utils/misc.py:54-96) exists to process portrait images stored
    # transposed inside mixed-aspect landscape batches. Here batches share
    # one aspect and every stage (conv embed, RoPE positions, DPT reshape,
    # pixel shuffle) is computed from the ACTUAL (h, w), so portrait
    # images are processed directly in their true orientation — the token
    # set and positions match the reference's scheme up to scan order
    # (attention is permutation-equivariant; see tests).
    x = images * 2.0 - 1.0  # DUSt3R ImgNorm
    x = jax.lax.conv_general_dilated(
        x, params["patch_embed"]["w"],
        (cfg.patch_size, cfg.patch_size), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["patch_embed"]["b"]
    hp, wp = h // cfg.patch_size, w // cfg.patch_size
    tokens = x.reshape(b, hp * wp, cfg.enc_embed_dim)
    pos = patch_positions(hp, wp, b)
    for blk in params["enc_blocks"]:
        tokens = _enc_block(blk, tokens, pos, cfg)
    tokens = _layer_norm(params["enc_norm"], tokens, cfg.ln_eps)
    return tokens, pos


def decode_pair(params, cfg: MASt3RConfig, f1, pos1, f2, pos2):
    """Dual-decoder pass (dust3r/model.py:171-190).

    Returns (dec1_list, dec2_list): the per-view hook list
    [enc_out, block1..block12] with the final entry layer-normed.
    """
    out1, out2 = [f1], [f2]
    x1 = _linear(params["decoder_embed"], f1)
    x2 = _linear(params["decoder_embed"], f2)
    for blk1, blk2 in zip(params["dec_blocks"], params["dec_blocks2"]):
        nx1 = _dec_block(blk1, x1, x2, pos1, pos2, cfg)
        nx2 = _dec_block(blk2, x2, x1, pos2, pos1, cfg)
        x1, x2 = nx1, nx2
        out1.append(x1)
        out2.append(x2)
    out1[-1] = _layer_norm(params["dec_norm"], out1[-1], cfg.ln_eps)
    out2[-1] = _layer_norm(params["dec_norm"], out2[-1], cfg.ln_eps)
    return out1, out2


# ---------------------------------------------------------------------------
# DPT head
# ---------------------------------------------------------------------------


def _conv(p, x, stride=1, padding="SAME"):
    out = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + p["b"] if "b" in p else out


def _conv_transpose(p, x, stride):
    out = jax.lax.conv_transpose(
        x, p["w"], (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + p["b"]


def _interp_matrix(n_out, n_in, dtype):
    """[n_out, n_in] align_corners=True bilinear interpolation operator
    (two nonzeros per row)."""
    if n_out == 1:
        m = jnp.zeros((1, n_in), jnp.float32).at[0, 0].set(1.0)
        return m.astype(dtype)
    g = jnp.arange(n_out) * ((n_in - 1) / (n_out - 1))
    i0 = jnp.clip(jnp.floor(g).astype(jnp.int32), 0, n_in - 1)
    i1 = jnp.clip(i0 + 1, 0, n_in - 1)
    frac = (g - i0).astype(jnp.float32)
    rows = jnp.arange(n_out)
    m = jnp.zeros((n_out, n_in), jnp.float32)
    m = m.at[rows, i0].add(1.0 - frac).at[rows, i1].add(frac)
    return m.astype(dtype)


def _resize_bilinear_ac(x, out_h, out_w):
    """Bilinear with align_corners=True (torch interpolate semantics used
    throughout DPT; jax.image.resize implements only align_corners=False).

    Expressed as two separable interpolation MATMULS rather than gathers:
    identical weights, but the lane-axis (width) gather the indexed form
    needs is bandwidth-poor on TPU while these contractions ride the MXU
    (measured: the DPT head's five resizes dominated the per-pair head
    cost before this change)."""
    b, h, w, c = x.shape
    ry = _interp_matrix(out_h, h, x.dtype)
    rx = _interp_matrix(out_w, w, x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", ry, x)
    return jnp.einsum("pw,bowc->bopc", rx, x)


def _residual_conv_unit(p, x):
    out = jax.nn.relu(x)
    out = _conv(p["conv1"], out)
    out = jax.nn.relu(out)
    out = _conv(p["conv2"], out)
    return out + x


def _fusion_block(p, x, skip=None):
    out = x
    if skip is not None:
        out = out + _residual_conv_unit(p["res1"], skip)
    out = _residual_conv_unit(p["res2"], out)
    b, h, w, c = out.shape
    out = _resize_bilinear_ac(out, h * 2, w * 2)
    return _conv(p["out_conv"], out)


def dpt_head(params, cfg: MASt3RConfig, hook_tokens, h, w):
    """hook_tokens: 4 token arrays [B,S,*] at cfg.dpt_hooks -> [B,H,W,4]."""
    hp, wp = h // cfg.patch_size, w // cfg.patch_size
    feats = []
    for i, tok in enumerate(hook_tokens):
        f = tok.reshape(tok.shape[0], hp, wp, tok.shape[-1])
        f = _conv(params["act"][i]["project"], f)
        if i == 0:
            f = _conv_transpose(params["act"][i]["resample"], f, 4)
        elif i == 1:
            f = _conv_transpose(params["act"][i]["resample"], f, 2)
        elif i == 3:
            f = _conv(params["act"][i]["resample"], f, stride=2)
        f = _conv(params["layer_rn"][i], f)
        feats.append(f)

    path = _fusion_block(params["refine"][3], feats[3])
    path = path[:, : feats[2].shape[1], : feats[2].shape[2], :]
    path = _fusion_block(params["refine"][2], path, feats[2])
    path = _fusion_block(params["refine"][1], path, feats[1])
    path = _fusion_block(params["refine"][0], path, feats[0])

    out = _conv(params["head"]["conv1"], path)
    # 1x1 output conv BEFORE the x2 upsample: the reference head is
    # conv3x3 -> Interpolate -> conv1x1 with no nonlinearity between
    # (checkpoint keys head.0 / head.2), and both the 1x1 conv and the
    # bilinear resize are linear, so they commute exactly — running the
    # conv at quarter resolution and resizing 4 channels instead of 128
    # removes most of the head's full-res work (the 4-wide conv output
    # also underfills MXU lanes; a quarter as many pixels pay it)
    out = _conv(params["head"]["conv2"], out)
    b, hh, ww, c = out.shape
    return _resize_bilinear_ac(out, hh * 2, ww * 2)  # [B, H, W, 3+1]


def _pixel_shuffle_tokens(tokens, hp, wp, channels, r):
    """tokens [B, S, channels*r*r] (torch (C, i, j) channel layout) ->
    [B, hp*r, wp*r, channels] (F.pixel_shuffle semantics)."""
    b, s, _ = tokens.shape
    x = tokens.reshape(b, hp, wp, channels, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, hp, i, wp, j, c
    return x.reshape(b, hp * r, wp * r, channels)


def catmlp_dpt_head(params, cfg: MASt3RConfig, dec_list, h, w):
    """Cat_MLP_LocalFeatures_DPT_Pts3d forward + postprocess.

    Returns dict(pts3d [B,H,W,3], conf [B,H,W], desc [B,H,W,24],
    desc_conf [B,H,W]).
    """
    hooks = [dec_list[i] for i in cfg.dpt_hooks]
    raw = dpt_head(params["dpt"], cfg, hooks, h, w)  # [B,H,W,4]

    cat = jnp.concatenate([dec_list[0], dec_list[-1]], -1)
    lf = _mlp(params["local_features"], cat, cfg.ln_eps)
    hp, wp = h // cfg.patch_size, w // cfg.patch_size
    n_lf = cfg.local_feat_dim + int(cfg.two_confs)
    lf = _pixel_shuffle_tokens(lf, hp, wp, n_lf, cfg.patch_size)

    # postprocess: exp-norm depth decode, 1+exp conf, L2 desc
    xyz = raw[..., :3]
    d = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    pts3d = xyz / jnp.maximum(d, 1e-8) * jnp.expm1(d)
    conf = 1.0 + jnp.exp(raw[..., 3])
    desc = lf[..., : cfg.local_feat_dim]
    desc = desc / jnp.maximum(
        jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)
    if cfg.two_confs:
        desc_conf = 1.0 + jnp.exp(lf[..., cfg.local_feat_dim])
    else:
        desc_conf = conf
    return dict(pts3d=pts3d, conf=conf, desc=desc, desc_conf=desc_conf)


# ---------------------------------------------------------------------------
# full forward
# ---------------------------------------------------------------------------


def forward_pair(params, cfg: MASt3RConfig, img1, img2):
    """(res1, res2) for image batches [B,H,W,3] in [0,1]; res2's pts3d are
    in view 1's frame ('pts3d_in_other_view', dust3r/model.py:208-209)."""
    b, h, w, _ = img1.shape
    f, pos = encode_images(params, cfg, jnp.concatenate([img1, img2], 0))
    f1, f2 = f[:b], f[b:]
    pos1, pos2 = pos[:b], pos[b:]
    dec1, dec2 = decode_pair(params, cfg, f1, pos1, f2, pos2)
    res1 = catmlp_dpt_head(params["head1"], cfg, dec1, h, w)
    res2 = catmlp_dpt_head(params["head2"], cfg, dec2, h, w)
    return res1, res2


def forward_from_encoded(params, cfg: MASt3RConfig, f1, pos1, f2, pos2,
                         h: int, w: int, h2: int | None = None,
                         w2: int | None = None):
    """Decoder+heads only — for inference where each unique image is
    encoded ONCE and pairs reuse the cached tokens (improves on the
    reference's symmetrized half-compute trick, dust3r/model.py:152-169).

    (h, w) is view 1's image shape; (h2, w2) view 2's (defaults to view
    1's). Distinct shapes support mixed-aspect pairs — the cross-attention
    is shape-agnostic over token sets and each head reshapes to its own
    view's grid (the reference handles this case by forcing batch_size=1,
    dust3r/inference.py:62-64)."""
    h2 = h if h2 is None else h2
    w2 = w if w2 is None else w2
    dec1, dec2 = decode_pair(params, cfg, f1, pos1, f2, pos2)
    res1 = catmlp_dpt_head(params["head1"], cfg, dec1, h, w)
    res2 = catmlp_dpt_head(params["head2"], cfg, dec2, h2, w2)
    return res1, res2


# ---------------------------------------------------------------------------
# parameter construction + torch checkpoint conversion
# ---------------------------------------------------------------------------


def _init_ln(d):
    return {"scale": jnp.ones(d), "bias": jnp.zeros(d)}


def _init_linear(rng, din, dout, scale=None):
    scale = scale if scale is not None else 1.0 / math.sqrt(din)
    return {
        "w": jnp.asarray(
            rng.standard_normal((din, dout)).astype(np.float32) * scale),
        "b": jnp.zeros(dout),
    }


def _init_conv(rng, kh, kw, cin, cout, bias=True):
    p = {"w": jnp.asarray(
        rng.standard_normal((kh, kw, cin, cout)).astype(np.float32)
        * (1.0 / math.sqrt(kh * kw * cin)))}
    if bias:
        p["b"] = jnp.zeros(cout)
    return p


class _RngIter:
    """numpy generator posing as the old split-key iterator (host-side
    init: thousands of tiny on-device RNG calls over the TPU tunnel made
    ViT-L init take minutes)."""

    def __init__(self, seed):
        self.rng = np.random.default_rng(seed)

    def __next__(self):
        return self.rng


def init_params(cfg: MASt3RConfig = MASt3RConfig(), seed: int = 0):
    """Random parameter tree (testing / shape-checking)."""
    ks = _RngIter(seed)

    def enc_blk(d, hd):
        return {
            "norm1": _init_ln(d),
            "attn": {"qkv": _init_linear(next(ks), d, 3 * d),
                     "proj": _init_linear(next(ks), d, d)},
            "norm2": _init_ln(d),
            "mlp": {"fc1": _init_linear(next(ks), d, cfg.mlp_ratio * d),
                    "fc2": _init_linear(next(ks), cfg.mlp_ratio * d, d)},
        }

    def dec_blk(d):
        return {
            **enc_blk(d, cfg.dec_num_heads),
            "norm3": _init_ln(d),
            "norm_y": _init_ln(d),
            "cross_attn": {
                "projq": _init_linear(next(ks), d, d),
                "projk": _init_linear(next(ks), d, d),
                "projv": _init_linear(next(ks), d, d),
                "proj": _init_linear(next(ks), d, d),
            },
        }

    def dpt():
        ld = cfg.dpt_layer_dims
        fd = cfg.dpt_feature_dim
        act = []
        for i, (dt, d) in enumerate(zip(cfg.dpt_dim_tokens, ld)):
            branch = {"project": _init_conv(next(ks), 1, 1, dt, d)}
            if i == 0:
                branch["resample"] = _init_conv(next(ks), 4, 4, d, d)
            elif i == 1:
                branch["resample"] = _init_conv(next(ks), 2, 2, d, d)
            elif i == 3:
                branch["resample"] = _init_conv(next(ks), 3, 3, d, d)
            act.append(branch)
        return {
            "act": act,
            "layer_rn": [
                _init_conv(next(ks), 3, 3, d, fd, bias=False) for d in ld
            ],
            "refine": [
                {
                    "res1": {"conv1": _init_conv(next(ks), 3, 3, fd, fd),
                             "conv2": _init_conv(next(ks), 3, 3, fd, fd)},
                    "res2": {"conv1": _init_conv(next(ks), 3, 3, fd, fd),
                             "conv2": _init_conv(next(ks), 3, 3, fd, fd)},
                    "out_conv": _init_conv(next(ks), 1, 1, fd, fd),
                }
                for _ in range(4)
            ],
            "head": {
                "conv1": _init_conv(next(ks), 3, 3, fd, cfg.dpt_last_dim),
                "conv2": _init_conv(next(ks), 1, 1, cfg.dpt_last_dim, 4),
            },
        }

    def head():
        idim = cfg.enc_embed_dim + cfg.dec_embed_dim
        n_out = (cfg.local_feat_dim + int(cfg.two_confs)) * cfg.patch_size**2
        return {
            "dpt": dpt(),
            "local_features": {
                "fc1": _init_linear(next(ks), idim, 4 * idim),
                "fc2": _init_linear(next(ks), 4 * idim, n_out),
            },
        }

    d_e, d_d = cfg.enc_embed_dim, cfg.dec_embed_dim
    return {
        "patch_embed": _init_conv(
            next(ks), cfg.patch_size, cfg.patch_size, 3, d_e),
        "enc_blocks": [enc_blk(d_e, cfg.enc_num_heads)
                       for _ in range(cfg.enc_depth)],
        "enc_norm": _init_ln(d_e),
        "decoder_embed": _init_linear(next(ks), d_e, d_d),
        "dec_blocks": [dec_blk(d_d) for _ in range(cfg.dec_depth)],
        "dec_blocks2": [dec_blk(d_d) for _ in range(cfg.dec_depth)],
        "dec_norm": _init_ln(d_d),
        "head1": head(),
        "head2": head(),
    }


def _t_lin(sd, name):
    return {"w": jnp.asarray(np.asarray(sd[f"{name}.weight"]).T),
            "b": jnp.asarray(np.asarray(sd[f"{name}.bias"]))}


def _t_ln(sd, name):
    return {"scale": jnp.asarray(np.asarray(sd[f"{name}.weight"])),
            "bias": jnp.asarray(np.asarray(sd[f"{name}.bias"]))}


def _t_conv(sd, name, transpose=False):
    w = np.asarray(sd[f"{name}.weight"])
    if transpose:  # ConvTranspose2d [cin, cout, kh, kw] -> HWIO
        w = w.transpose(2, 3, 0, 1)
    else:  # Conv2d [cout, cin, kh, kw] -> HWIO
        w = w.transpose(2, 3, 1, 0)
    p = {"w": jnp.asarray(w)}
    if f"{name}.bias" in sd:
        p["b"] = jnp.asarray(np.asarray(sd[f"{name}.bias"]))
    return p


def convert_torch_checkpoint(state_dict, cfg: MASt3RConfig = MASt3RConfig()):
    """Map a MASt3R torch state_dict (AsymmetricMASt3R naming) into the
    JAX parameter tree. Handles the dec_blocks2 duplication rule
    (dust3r/model.py:90-97): if absent, dec_blocks weights are reused.
    """
    sd = {k: v for k, v in state_dict.items()}
    if not any(k.startswith("dec_blocks2") for k in sd):
        for k in list(sd):
            if k.startswith("dec_blocks."):
                sd[k.replace("dec_blocks.", "dec_blocks2.", 1)] = sd[k]

    def enc_blk(pre):
        return {
            "norm1": _t_ln(sd, f"{pre}.norm1"),
            "attn": {"qkv": _t_lin(sd, f"{pre}.attn.qkv"),
                     "proj": _t_lin(sd, f"{pre}.attn.proj")},
            "norm2": _t_ln(sd, f"{pre}.norm2"),
            "mlp": {"fc1": _t_lin(sd, f"{pre}.mlp.fc1"),
                    "fc2": _t_lin(sd, f"{pre}.mlp.fc2")},
        }

    def dec_blk(pre):
        return {
            **enc_blk(pre),
            "norm3": _t_ln(sd, f"{pre}.norm3"),
            "norm_y": _t_ln(sd, f"{pre}.norm_y"),
            "cross_attn": {
                "projq": _t_lin(sd, f"{pre}.cross_attn.projq"),
                "projk": _t_lin(sd, f"{pre}.cross_attn.projk"),
                "projv": _t_lin(sd, f"{pre}.cross_attn.projv"),
                "proj": _t_lin(sd, f"{pre}.cross_attn.proj"),
            },
        }

    def dpt(pre):
        act = []
        for i in range(4):
            branch = {"project": _t_conv(sd, f"{pre}.act_postprocess.{i}.0")}
            if i == 0:
                branch["resample"] = _t_conv(
                    sd, f"{pre}.act_postprocess.{i}.1", transpose=True)
            elif i == 1:
                branch["resample"] = _t_conv(
                    sd, f"{pre}.act_postprocess.{i}.1", transpose=True)
            elif i == 3:
                branch["resample"] = _t_conv(sd, f"{pre}.act_postprocess.{i}.1")
            act.append(branch)
        refine = []
        for i in range(4):
            rp = f"{pre}.scratch.refinenet{i + 1}"
            refine.append({
                "res1": {"conv1": _t_conv(sd, f"{rp}.resConfUnit1.conv1"),
                         "conv2": _t_conv(sd, f"{rp}.resConfUnit1.conv2")},
                "res2": {"conv1": _t_conv(sd, f"{rp}.resConfUnit2.conv1"),
                         "conv2": _t_conv(sd, f"{rp}.resConfUnit2.conv2")},
                "out_conv": _t_conv(sd, f"{rp}.out_conv"),
            })
        return {
            "act": act,
            "layer_rn": [
                _t_conv(sd, f"{pre}.scratch.layer{i + 1}_rn")
                for i in range(4)
            ],
            "refine": refine,
            "head": {"conv1": _t_conv(sd, f"{pre}.head.0"),
                     "conv2": _t_conv(sd, f"{pre}.head.2")},
        }

    def head(n):
        pre = f"downstream_head{n}"
        return {
            "dpt": dpt(f"{pre}.dpt"),
            "local_features": {
                "fc1": _t_lin(sd, f"{pre}.head_local_features.fc1"),
                "fc2": _t_lin(sd, f"{pre}.head_local_features.fc2"),
            },
        }

    return {
        "patch_embed": _t_conv(sd, "patch_embed.proj"),
        "enc_blocks": [enc_blk(f"enc_blocks.{i}")
                       for i in range(cfg.enc_depth)],
        "enc_norm": _t_ln(sd, "enc_norm"),
        "decoder_embed": _t_lin(sd, "decoder_embed"),
        "dec_blocks": [dec_blk(f"dec_blocks.{i}")
                       for i in range(cfg.dec_depth)],
        "dec_blocks2": [dec_blk(f"dec_blocks2.{i}")
                        for i in range(cfg.dec_depth)],
        "dec_norm": _t_ln(sd, "dec_norm"),
        "head1": head(1),
        "head2": head(2),
    }


def load_checkpoint(path, cfg: MASt3RConfig = MASt3RConfig()):
    """Load a MASt3R .pth checkpoint into the JAX tree (torch CPU load)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return convert_torch_checkpoint(sd, cfg)


def cast_params(params, dtype):
    """Cast matrix/conv weights to `dtype` for mixed-precision inference;
    LayerNorm scales/biases stay f32 (stats are computed in f32)."""

    def go(path_leaf):
        return jax.tree_util.tree_map_with_path(
            lambda kp, x: (
                x if any(
                    getattr(k, "key", None) in ("scale", "bias")
                    for k in kp
                ) else x.astype(dtype)
            ),
            path_leaf,
        )

    return go(params)
