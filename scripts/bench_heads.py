"""MASt3R head/decoder stage-split MFU probe (real chip).

VERDICT r4 item 4: decoder ~23% MFU, heads ~14% — find where the time
actually goes before touching anything. Cumulative-probe method (the same
discipline as scripts/bench_split.py): probe k computes stages 1..k and
consumes EVERY intermediate (sums folded into one scalar) so XLA cannot
DCE earlier stages; stage cost = probe_k - probe_{k-1}. Per-rep input
perturbation + host-scalar sync per the axon timing rules.

  python scripts/bench_heads.py [--batch-size 24] [--reps 4] [--dtype bf16]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=24)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--hw", type=int, nargs=2, default=[384, 512])
    ap.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    ap.add_argument("--peak-tflops", type=float, default=197.0)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny architecture (CPU smoke of the harness)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from instantsplat_tpu.models import mast3r
    from instantsplat_tpu.models.mast3r import (
        _conv,
        _conv_transpose,
        _fusion_block,
        _mlp,
        _pixel_shuffle_tokens,
        _resize_bilinear_ac,
    )

    cfg = mast3r.MASt3RConfig()
    h, w = args.hw
    if args.tiny:
        cfg = mast3r.MASt3RConfig(
            enc_embed_dim=64, enc_depth=2, enc_num_heads=2,
            dec_embed_dim=48, dec_depth=12, dec_num_heads=2,
            dpt_layer_dims=(8, 16, 24, 32), dpt_feature_dim=16,
            dpt_last_dim=8)
        h, w = 32, 32
    hp, wp = h // cfg.patch_size, w // cfg.patch_size
    s = hp * wp
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    b = args.batch_size
    params = mast3r.init_params(cfg, seed=0)
    if args.dtype == "bf16":
        params = mast3r.cast_params(params, dtype)
    hd = params["head1"]
    rng = np.random.default_rng(0)

    # decoder token stand-ins: [B, S, dim] at every hook + dec0/dec_last
    def rand(shape):
        return jnp.asarray(rng.standard_normal(shape), dtype)

    hooks0 = [rand((b, s, d)) for d in cfg.dpt_dim_tokens]
    dec0 = rand((b, s, cfg.enc_embed_dim))
    dec_last = rand((b, s, cfg.dec_embed_dim))

    def feats_stage(hooks):
        feats = []
        for i, tok in enumerate(hooks):
            f = tok.reshape(tok.shape[0], hp, wp, tok.shape[-1])
            f = _conv(hd["dpt"]["act"][i]["project"], f)
            if i == 0:
                f = _conv_transpose(hd["dpt"]["act"][i]["resample"], f, 4)
            elif i == 1:
                f = _conv_transpose(hd["dpt"]["act"][i]["resample"], f, 2)
            elif i == 3:
                f = _conv(hd["dpt"]["act"][i]["resample"], f, stride=2)
            f = _conv(hd["dpt"]["layer_rn"][i], f)
            feats.append(f)
        return feats

    def refine_stage(feats):
        path = _fusion_block(hd["dpt"]["refine"][3], feats[3])
        path = path[:, : feats[2].shape[1], : feats[2].shape[2], :]
        path = _fusion_block(hd["dpt"]["refine"][2], path, feats[2])
        path = _fusion_block(hd["dpt"]["refine"][1], path, feats[1])
        path = _fusion_block(hd["dpt"]["refine"][0], path, feats[0])
        return path

    def conv1_stage(path):
        return _conv(hd["dpt"]["head"]["conv1"], path)

    def conv2_stage(out):
        # quarter-res 1x1 (runs BEFORE the upsample in the model)
        return _conv(hd["dpt"]["head"]["conv2"], out)

    def resize_stage(out):
        bb, hh, ww, c = out.shape
        return _resize_bilinear_ac(out, hh * 2, ww * 2)

    def local_stage(d0, dl):
        cat = jnp.concatenate([d0, dl], -1)
        lf = _mlp(hd["local_features"], cat, cfg.ln_eps)
        n_lf = cfg.local_feat_dim + int(cfg.two_confs)
        return _pixel_shuffle_tokens(lf, hp, wp, n_lf, cfg.patch_size)

    def post_stage(raw, lf):
        xyz = raw[..., :3].astype(jnp.float32)
        d = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
        pts3d = xyz / jnp.maximum(d, 1e-8) * jnp.expm1(d)
        conf = 1.0 + jnp.exp(raw[..., 3].astype(jnp.float32))
        desc = lf[..., : cfg.local_feat_dim].astype(jnp.float32)
        desc = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)
        dc = 1.0 + jnp.exp(lf[..., cfg.local_feat_dim].astype(jnp.float32))
        return pts3d, conf, desc, dc

    def reduce_all(*xs):
        tot = jnp.float32(0)
        for x in xs:
            tot = tot + jnp.sum(x.astype(jnp.float32))
        return tot

    # cumulative probes
    def p_feats(hooks, d0, dl):
        return reduce_all(*feats_stage(hooks))

    def p_refine(hooks, d0, dl):
        feats = feats_stage(hooks)
        return reduce_all(refine_stage(feats), *feats)

    def p_conv1(hooks, d0, dl):
        feats = feats_stage(hooks)
        path = refine_stage(feats)
        return reduce_all(conv1_stage(path), path, *feats)

    def p_conv2(hooks, d0, dl):
        feats = feats_stage(hooks)
        path = refine_stage(feats)
        o1 = conv1_stage(path)
        return reduce_all(conv2_stage(o1), o1, path, *feats)

    def p_resize(hooks, d0, dl):
        feats = feats_stage(hooks)
        path = refine_stage(feats)
        o1 = conv1_stage(path)
        o2 = conv2_stage(o1)
        return reduce_all(resize_stage(o2), o2, o1, path, *feats)

    def p_local(hooks, d0, dl):
        feats = feats_stage(hooks)
        path = refine_stage(feats)
        o1 = conv1_stage(path)
        raw = resize_stage(conv2_stage(o1))
        lf = local_stage(d0, dl)
        return reduce_all(raw, lf, o1, path, *feats)

    def p_post(hooks, d0, dl):
        feats = feats_stage(hooks)
        path = refine_stage(feats)
        o1 = conv1_stage(path)
        raw = resize_stage(conv2_stage(o1))
        lf = local_stage(d0, dl)
        return reduce_all(*post_stage(raw, lf), raw, lf, o1, path,
                          *feats)

    probes = [("feats", p_feats), ("refine", p_refine),
              ("conv1", p_conv1), ("conv2", p_conv2),
              ("resize", p_resize), ("local_mlp", p_local),
              ("postprocess", p_post)]

    def timed(fn):
        j = jax.jit(fn)
        fl = None
        try:
            ca = j.lower(hooks0, dec0, dec_last).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            fl = float(ca["flops"])
        except Exception:  # noqa: BLE001
            pass
        float(j(hooks0, dec0, dec_last))  # warm + sync
        # per-rep INPUT perturbation (distinct programs defeat the
        # worker's value-dedup) but only ONE host read after the loop: a
        # float() inside the loop serializes a full tunnel round-trip
        # per rep (measured a 392 ms "feats" stage whose true cumulative
        # cost is ~40 ms, making the next stage's delta negative)
        t0 = time.perf_counter()
        out = None
        for r in range(args.reps):
            eps = jnp.asarray(1e-6 * (r + 1), dtype)
            out = j([x + eps for x in hooks0], dec0 + eps, dec_last)
        float(out)
        return (time.perf_counter() - t0) / args.reps, fl

    peak = args.peak_tflops * 1e12
    prev_t, prev_f = 0.0, 0.0
    for name, fn in probes:
        t, fl = timed(fn)
        dt, dfl = t - prev_t, (fl or 0) - prev_f
        print(json.dumps({
            "stage": name, "cum_ms": round(t * 1e3, 2),
            "stage_ms": round(dt * 1e3, 2),
            "stage_ms_per_pair": round(dt / b * 1e3, 3),
            "stage_gflops": round(dfl / 1e9, 1) if fl else None,
            "stage_mfu": round(dfl / max(dt, 1e-9) / peak, 3)
            if fl else None,
        }), flush=True)
        prev_t, prev_f = t, fl or prev_f


if __name__ == "__main__":
    main()
