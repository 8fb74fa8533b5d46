"""MASt3R JAX model: shapes, semantics, converter mapping, inference path.

No pretrained weights exist in this environment, so these tests validate
the architecture (shapes, postprocess laws, RoPE structure, encode-once
inference equivalence) on a tiny random-weight config, and the torch
checkpoint converter on a synthetic state_dict with reference naming.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from instantsplat_tpu.models import mast3r
from instantsplat_tpu.models.mast3r_infer import infer_pairs

TINY = mast3r.MASt3RConfig(
    patch_size=16,
    enc_embed_dim=64,
    enc_depth=2,
    enc_num_heads=2,
    dec_embed_dim=48,
    dec_depth=12,  # dpt hooks need dec_depth (uses 0, 6, 9, 12)
    dec_num_heads=2,
    local_feat_dim=24,
    dpt_layer_dims=(8, 16, 24, 32),
    dpt_feature_dim=16,
    dpt_last_dim=8,
)


@pytest.fixture(scope="module")
def tiny_model():
    return mast3r.init_params(TINY, seed=0), TINY


def test_forward_shapes_and_postprocess(tiny_model):
    params, cfg = tiny_model
    h, w = 32, 48
    rng = np.random.default_rng(0)
    img1 = rng.random((2, h, w, 3)).astype(np.float32)
    img2 = rng.random((2, h, w, 3)).astype(np.float32)
    r1, r2 = mast3r.forward_pair(params, cfg, img1, img2)
    for r in (r1, r2):
        assert r["pts3d"].shape == (2, h, w, 3)
        assert r["conf"].shape == (2, h, w)
        assert r["desc"].shape == (2, h, w, 24)
        assert r["desc_conf"].shape == (2, h, w)
        # postprocess laws: conf = 1 + exp(x) > 1; desc unit-normalized
        assert float(jnp.min(r["conf"])) > 1.0
        assert float(jnp.min(r["desc_conf"])) > 1.0
        norms = jnp.linalg.norm(r["desc"], axis=-1)
        np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-5)
        assert np.isfinite(np.asarray(r["pts3d"])).all()


def test_encode_once_matches_full_forward(tiny_model):
    """forward_from_encoded on cached tokens == forward_pair."""
    params, cfg = tiny_model
    h, w = 32, 32
    rng = np.random.default_rng(1)
    img1 = rng.random((1, h, w, 3)).astype(np.float32)
    img2 = rng.random((1, h, w, 3)).astype(np.float32)
    r1, r2 = mast3r.forward_pair(params, cfg, img1, img2)
    f, pos = mast3r.encode_images(
        params, cfg, jnp.concatenate([img1, img2], 0))
    q1, q2 = mast3r.forward_from_encoded(
        params, cfg, f[:1], pos[:1], f[1:], pos[1:], h, w)
    np.testing.assert_allclose(
        np.asarray(r1["pts3d"]), np.asarray(q1["pts3d"]), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(r2["conf"]), np.asarray(q2["conf"]), atol=1e-5)


def test_asymmetry_and_cross_attention():
    """head2/dec_blocks2 differ from head1; swapping inputs changes
    outputs; view-2 output depends on view-1 content (cross-attn works)."""
    params = mast3r.init_params(TINY, seed=0)
    rng = np.random.default_rng(2)
    h, w = 32, 32
    a = rng.random((1, h, w, 3)).astype(np.float32)
    b = rng.random((1, h, w, 3)).astype(np.float32)
    c = rng.random((1, h, w, 3)).astype(np.float32)
    r1_ab, r2_ab = mast3r.forward_pair(params, TINY, a, b)
    r1_ac, _ = mast3r.forward_pair(params, TINY, a, c)
    # view-1 head output changes when the OTHER view changes -> cross-attn
    assert float(jnp.abs(r1_ab["pts3d"] - r1_ac["pts3d"]).max()) > 1e-6
    # asymmetric: res1(a,b) != res2(b,a) in general (different decoders)
    _, r2_ba = mast3r.forward_pair(params, TINY, b, a)
    assert float(jnp.abs(r1_ab["pts3d"] - r2_ba["pts3d"]).max()) > 1e-6


def test_rope_translation_structure():
    """RoPE is relative: translating all patch positions by a constant
    leaves self-attention outputs unchanged."""
    params = mast3r.init_params(TINY, seed=0)
    cfg = TINY
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 6, cfg.enc_embed_dim)),
                    jnp.float32)
    pos = jnp.asarray(rng.integers(0, 8, (1, 6, 2)))
    blk = params["enc_blocks"][0]
    y1 = mast3r._enc_block(blk, x, pos, cfg)
    y2 = mast3r._enc_block(blk, x, pos + jnp.array([[5, 3]]), cfg)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-4)


def _fake_torch_sd(cfg):
    """Synthetic state_dict with AsymmetricMASt3R naming (numpy values)."""
    rng = np.random.default_rng(0)
    sd = {}

    def lin(name, din, dout):
        sd[f"{name}.weight"] = rng.standard_normal(
            (dout, din)).astype(np.float32) * 0.02
        sd[f"{name}.bias"] = rng.standard_normal(dout).astype(np.float32)

    def ln(name, d):
        sd[f"{name}.weight"] = np.ones(d, np.float32)
        sd[f"{name}.bias"] = np.zeros(d, np.float32)

    def conv(name, cout, cin, k, bias=True, transpose=False):
        shape = (cin, cout, k, k) if transpose else (cout, cin, k, k)
        sd[f"{name}.weight"] = rng.standard_normal(
            shape).astype(np.float32) * 0.02
        if bias:
            sd[f"{name}.bias"] = rng.standard_normal(cout).astype(np.float32)

    de, dd = cfg.enc_embed_dim, cfg.dec_embed_dim
    conv("patch_embed.proj", de, 3, cfg.patch_size)
    for i in range(cfg.enc_depth):
        p = f"enc_blocks.{i}"
        ln(f"{p}.norm1", de)
        lin(f"{p}.attn.qkv", de, 3 * de)
        lin(f"{p}.attn.proj", de, de)
        ln(f"{p}.norm2", de)
        lin(f"{p}.mlp.fc1", de, 4 * de)
        lin(f"{p}.mlp.fc2", 4 * de, de)
    ln("enc_norm", de)
    lin("decoder_embed", de, dd)
    # only dec_blocks (no dec_blocks2) -> converter must duplicate
    for i in range(cfg.dec_depth):
        p = f"dec_blocks.{i}"
        ln(f"{p}.norm1", dd)
        lin(f"{p}.attn.qkv", dd, 3 * dd)
        lin(f"{p}.attn.proj", dd, dd)
        ln(f"{p}.norm2", dd)
        ln(f"{p}.norm3", dd)
        ln(f"{p}.norm_y", dd)
        for nm in ("projq", "projk", "projv", "proj"):
            lin(f"{p}.cross_attn.{nm}", dd, dd)
        lin(f"{p}.mlp.fc1", dd, 4 * dd)
        lin(f"{p}.mlp.fc2", 4 * dd, dd)
    ln("dec_norm", dd)
    for n in (1, 2):
        p = f"downstream_head{n}"
        ld = cfg.dpt_layer_dims
        fd = cfg.dpt_feature_dim
        for i, (dt, d) in enumerate(zip(cfg.dpt_dim_tokens, ld)):
            conv(f"{p}.dpt.act_postprocess.{i}.0", d, dt, 1)
            if i == 0:
                conv(f"{p}.dpt.act_postprocess.{i}.1", d, d, 4,
                     transpose=True)
            elif i == 1:
                conv(f"{p}.dpt.act_postprocess.{i}.1", d, d, 2,
                     transpose=True)
            elif i == 3:
                conv(f"{p}.dpt.act_postprocess.{i}.1", d, d, 3)
        for i, d in enumerate(ld):
            conv(f"{p}.dpt.scratch.layer{i + 1}_rn", fd, d, 3, bias=False)
        for i in range(4):
            rp = f"{p}.dpt.scratch.refinenet{i + 1}"
            conv(f"{rp}.resConfUnit1.conv1", fd, fd, 3)
            conv(f"{rp}.resConfUnit1.conv2", fd, fd, 3)
            conv(f"{rp}.resConfUnit2.conv1", fd, fd, 3)
            conv(f"{rp}.resConfUnit2.conv2", fd, fd, 3)
            conv(f"{rp}.out_conv", fd, fd, 1)
        conv(f"{p}.dpt.head.0", cfg.dpt_last_dim, fd, 3)
        conv(f"{p}.dpt.head.2", 4, cfg.dpt_last_dim, 1)
        idim = de + dd
        n_out = (cfg.local_feat_dim + 1) * cfg.patch_size**2
        lin(f"{p}.head_local_features.fc1", idim, 4 * idim)
        lin(f"{p}.head_local_features.fc2", 4 * idim, n_out)
    return sd


def test_checkpoint_converter_runs_forward():
    sd = _fake_torch_sd(TINY)
    params = mast3r.convert_torch_checkpoint(sd, TINY)
    # duplication rule applied
    w1 = params["dec_blocks"][0]["attn"]["qkv"]["w"]
    w2 = params["dec_blocks2"][0]["attn"]["qkv"]["w"]
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2))
    # linear transpose: torch [dout, din] -> ours [din, dout]
    np.testing.assert_allclose(
        np.asarray(params["decoder_embed"]["w"]),
        sd["decoder_embed.weight"].T)
    rng = np.random.default_rng(4)
    img = rng.random((1, 32, 48, 3)).astype(np.float32)
    r1, r2 = mast3r.forward_pair(params, TINY, img, img)
    assert np.isfinite(np.asarray(r1["pts3d"])).all()
    assert r1["desc"].shape[-1] == 24


def test_infer_pairs_produces_pair_prediction(tiny_model):
    params, cfg = tiny_model
    rng = np.random.default_rng(5)
    imgs = rng.random((3, 32, 32, 3)).astype(np.float32)
    pairs = [(0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1)]
    preds = infer_pairs(params, cfg, imgs, pairs, batch_size=4)
    assert preds.pred_i.shape == (6, 32, 32, 3)
    assert preds.conf_j.shape == (6, 32, 32)
    assert preds.n_imgs == 3
    # cached-encoding consistency: direct forward of pair (0, 1)
    r1, _ = mast3r.forward_pair(params, cfg, imgs[0:1], imgs[1:2])
    ref = np.asarray(r1["pts3d"][0])
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(
        preds.pred_i[0] / scale, ref / scale, atol=1e-4)


def test_portrait_orientation(tiny_model):
    """Portrait inputs run directly in their true orientation; the encoder
    is equivariant to token scan order, which makes this equal to the
    reference's ManyAR scheme (true-orientation patches in transposed scan
    order with matching positions)."""
    params, cfg = tiny_model
    rng = np.random.default_rng(7)
    h, w = 48, 32  # portrait
    img1 = rng.random((1, h, w, 3)).astype(np.float32)
    img2 = rng.random((1, h, w, 3)).astype(np.float32)
    r1, r2 = mast3r.forward_pair(params, cfg, img1, img2)
    assert r1["pts3d"].shape == (1, h, w, 3)
    assert np.isfinite(np.asarray(r1["pts3d"])).all()
    assert r2["desc"].shape == (1, h, w, cfg.local_feat_dim)

    # scan-order equivariance: permute tokens+positions (column-major scan,
    # the ManyAR portrait order) -> encoder output is the same permutation
    f_direct, pos_direct = mast3r.encode_images(params, cfg, img1)
    hp, wp = h // cfg.patch_size, w // cfg.patch_size
    perm = np.arange(hp * wp).reshape(hp, wp).T.reshape(-1)

    x = jnp.asarray(img1) * 2.0 - 1.0
    import jax

    tok = jax.lax.conv_general_dilated(
        x, params["patch_embed"]["w"],
        (cfg.patch_size, cfg.patch_size), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["patch_embed"]["b"]
    tok = tok.reshape(1, hp * wp, cfg.enc_embed_dim)[:, perm]
    posP = pos_direct[:, perm]
    t = tok
    for blk in params["enc_blocks"]:
        t = mast3r._enc_block(blk, t, posP, cfg)
    t = mast3r._layer_norm(params["enc_norm"], t, cfg.ln_eps)
    inv = np.argsort(perm)
    np.testing.assert_allclose(
        np.asarray(t[:, inv]), np.asarray(f_direct), atol=2e-4)


def test_bf16_inference_close_to_f32(tiny_model):
    params, cfg = tiny_model
    rng = np.random.default_rng(11)
    imgs = rng.random((2, 32, 32, 3)).astype(np.float32)
    pairs = [(0, 1), (1, 0)]
    p32 = infer_pairs(params, cfg, imgs, pairs, batch_size=2)
    p16 = infer_pairs(params, cfg, imgs, pairs, batch_size=2,
                      dtype=jnp.bfloat16)
    # pointmaps agree to bf16-level accuracy for almost every element
    # (random-weight expm1 outputs have huge-magnitude outliers where
    # bf16's 8-bit mantissa legitimately deviates more)
    scale = np.abs(p32.pred_i).max()
    d = np.abs(p16.pred_i - p32.pred_i) / scale
    assert np.quantile(d, 0.999) < 0.05, np.quantile(d, 0.999)
    assert d.max() < 0.5, d.max()
    # outputs are f32 regardless
    assert p16.pred_i.dtype == np.float32


def test_load_checkpoint_from_torch_file(tmp_path):
    """Full load path: torch.save'd {'model': state_dict} -> JAX tree."""
    import torch

    sd = _fake_torch_sd(TINY)
    t_sd = {k: torch.from_numpy(v) for k, v in sd.items()}
    path = tmp_path / "ckpt.pth"
    torch.save({"model": t_sd, "args": "AsymmetricMASt3R(...)"}, path)
    params = mast3r.load_checkpoint(path, TINY)
    rng = np.random.default_rng(5)
    img = rng.random((1, 32, 32, 3)).astype(np.float32)
    r1, _ = mast3r.forward_pair(params, TINY, img, img)
    assert np.isfinite(np.asarray(r1["pts3d"])).all()


def test_infer_pairs_mixed_aspect(tiny_model):
    """Mixed portrait + landscape image sets through infer_pairs_mixed:
    every per-edge map comes back in its own image's true shape, and edges
    whose views share one shape match the uniform-batch forward exactly
    (reference mixed-shape semantics: dust3r/inference.py:62-64).
    infer_pairs itself REFUSES mixed lists (its PairPrediction contract
    can't hold per-image shapes) with a pointer here."""
    import pytest

    from instantsplat_tpu.init.pairs import make_pair_indices
    from instantsplat_tpu.models.mast3r_infer import (infer_pairs,
                                                      infer_pairs_mixed)

    params, cfg = tiny_model
    rng = np.random.default_rng(11)
    shapes = [(32, 48), (48, 32), (32, 48)]  # landscape, portrait, landscape
    imgs = [rng.random((h, w, 3)).astype(np.float32) for h, w in shapes]
    pairs = make_pair_indices(3, "complete", symmetrize=True)

    with pytest.raises(TypeError, match="infer_pairs_mixed"):
        infer_pairs(params, cfg, imgs, pairs)

    res = infer_pairs_mixed(params, cfg, imgs, pairs)
    assert isinstance(res, list) and len(res) == len(pairs)
    for (i, j), r in zip(pairs, res):
        hi, wi = shapes[i]
        hj, wj = shapes[j]
        assert r["pred_i"].shape == (hi, wi, 3), (i, j)
        assert r["pred_j"].shape == (hj, wj, 3), (i, j)
        assert r["conf_i"].shape == (hi, wi)
        assert r["conf_j"].shape == (hj, wj)
        assert r["desc_i"].shape == (hi, wi, cfg.local_feat_dim)
        for v in r.values():
            assert np.isfinite(v).all()

    # same-shape edge (0, 2) must equal the plain uniform-batch forward
    e02 = pairs.index((0, 2))
    r1, r2 = mast3r.forward_pair(params, cfg, imgs[0][None], imgs[2][None])
    scale = max(np.abs(np.asarray(r1["pts3d"][0])).max(), 1.0)
    np.testing.assert_allclose(res[e02]["pred_i"] / scale,
                               np.asarray(r1["pts3d"][0]) / scale, atol=1e-4)
    np.testing.assert_allclose(res[e02]["pred_j"] / scale,
                               np.asarray(r2["pts3d"][0]) / scale, atol=1e-4)


def test_infer_pairs_uniform_list_input(tiny_model):
    """A list of SAME-shape images stacks onto the fast uniform path."""
    from instantsplat_tpu.init.pairs import make_pair_indices
    from instantsplat_tpu.models.mast3r_infer import infer_pairs

    params, cfg = tiny_model
    rng = np.random.default_rng(12)
    imgs_arr = rng.random((2, 32, 48, 3)).astype(np.float32)
    pairs = make_pair_indices(2, "complete", symmetrize=True)
    a = infer_pairs(params, cfg, imgs_arr, pairs)
    b = infer_pairs(params, cfg, list(imgs_arr), pairs)
    np.testing.assert_allclose(a.pred_i, b.pred_i, atol=0)


def test_make_pointmap_fn_random_weights(tiny_model):
    """--ckpt_path random[:SEED] builds the production pointmap_fn with
    randomly initialized weights (the bench_e2e.py path in an environment
    without pretrained checkpoints); seeds are reproducible."""
    _, cfg = tiny_model
    from instantsplat_tpu.models.mast3r_infer import make_pointmap_fn

    fn = make_pointmap_fn("random:7", batch_size=2, cfg=cfg)
    fn2 = make_pointmap_fn("random:7", batch_size=2, cfg=cfg)
    imgs = np.random.default_rng(0).random((2, 32, 48, 3)).astype(np.float32)
    pairs = [(0, 1), (1, 0)]
    r = fn(imgs, pairs)
    r2 = fn2(imgs, pairs)
    assert np.isfinite(np.asarray(r.pred_i)).all()
    np.testing.assert_array_equal(np.asarray(r.pred_i),
                                  np.asarray(r2.pred_i))
    with pytest.raises(RuntimeError, match="ckpt_path"):
        make_pointmap_fn("", cfg=cfg)
