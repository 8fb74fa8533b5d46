#!/usr/bin/env python
"""Stage-1 (MASt3R) throughput + MFU benchmark on the real chip.

Measures the two dispatch shapes of the init_geo hot loop (SURVEY §3.1,
reference dust3r/model.py:198-210): per-image ViT-L encode and per-pair
dual-decode + DPT/catMLP heads, at the production 512-long-side
resolution with the full 688M-parameter architecture (random weights —
identical compute to a checkpointed model). FLOPs come from XLA's own
cost model (compiled.cost_analysis()), falling back to an analytic
transformer count; MFU = achieved TFLOP/s / peak.

Timing obeys the axon rules (CLAUDE.md): every repetition perturbs its
input value (identical dispatches are value-deduped and
block_until_ready can return early), and a host-scalar read at the end
syncs the device queue.

  python scripts/bench_mast3r.py [--views 12 24] [--dtype bf16]
      [--batch-size 8] [--reps 4] [--peak-tflops 197]

Prints one JSON line per metric + a summary line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def analytic_flops(cfg, h, w, batch):
    """Transformer-only FLOP estimate (2 * MACs): encoder per `batch`
    images; decoder per `batch` directed pairs (two cross-attending
    streams). Excludes DPT/catMLP convs (~10% of a pair) — used only when
    XLA's cost model is unavailable."""
    p = (h // cfg.patch_size) * (w // cfg.patch_size)
    d, l = cfg.enc_embed_dim, cfg.enc_depth
    patch = 2 * p * (cfg.patch_size ** 2 * 3) * d
    enc_block = 24 * p * d * d + 4 * p * p * d
    enc = batch * (patch + l * enc_block)

    dd, ld = cfg.dec_embed_dim, cfg.dec_depth
    embed = 2 * p * d * dd
    dec_block = 32 * p * dd * dd + 8 * p * p * dd
    dec = batch * 2 * (embed + ld * dec_block)
    return enc, dec


def _xla_flops(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])
    except Exception:
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, nargs="+", default=[3, 12, 24])
    ap.add_argument("--hw", type=int, nargs=2, default=[384, 512])
    ap.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--peak-tflops", type=float, default=197.0,
                    help="chip peak for the chosen dtype "
                         "(v5e: 197 bf16 / 98.5 f32)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny architecture on small images (CPU smoke "
                         "test of the harness, not a benchmark)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from instantsplat_tpu.models import mast3r

    cfg = mast3r.MASt3RConfig()
    h, w = args.hw
    if args.tiny:
        cfg = mast3r.MASt3RConfig(
            enc_embed_dim=64, enc_depth=2, enc_num_heads=2,
            dec_embed_dim=48, dec_depth=12, dec_num_heads=2,
            dpt_layer_dims=(8, 16, 24, 32), dpt_feature_dim=16,
            dpt_last_dim=8)
        h, w = 32, 32
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    peak = args.peak_tflops * 1e12

    params = mast3r.init_params(cfg, seed=0)
    if args.dtype == "bf16":
        params = mast3r.cast_params(params, dtype)
    rng = np.random.default_rng(0)
    bs = args.batch_size
    imgs = jnp.asarray(rng.random((bs, h, w, 3), np.float32), dtype)

    @jax.jit
    def encode(params, images):
        return mast3r.encode_images(params, cfg, images)

    @jax.jit
    def decode(params, f1, p1, f2, p2):
        return mast3r.forward_from_encoded(params, cfg, f1, p1, f2, p2,
                                           h, w)

    # ---- encode ----
    lowered = encode.lower(params, imgs)
    compiled = lowered.compile()
    enc_flops = _xla_flops(compiled)
    if enc_flops is None:
        enc_flops, _ = analytic_flops(cfg, h, w, bs)
    feats, pos = encode(params, imgs)
    float(jnp.sum(feats[:1, :1].astype(jnp.float32)))  # host sync
    # Timing on the axon tunnel: identical dispatches are value-deduped
    # and block_until_ready can return early, so every rep perturbs its
    # INPUT (distinct programs queue + run serially on the device) and a
    # host-scalar read at the end syncs the whole queue (CLAUDE.md).
    t0 = time.perf_counter()
    for r in range(args.reps):
        feats, pos = encode(params, imgs + jnp.asarray(1e-6 * (r + 1),
                                                       dtype))
    float(jnp.sum(feats[:1, :1].astype(jnp.float32)))
    dt_enc = (time.perf_counter() - t0) / args.reps
    enc_tflops = enc_flops / dt_enc / 1e12
    print(json.dumps({
        "metric": f"mast3r encode ms/image ({args.dtype}, {w}x{h})",
        "value": round(dt_enc / bs * 1e3, 3), "unit": "ms",
        "tflops_per_s": round(enc_tflops, 1),
        "mfu": round(enc_tflops * 1e12 / peak, 3)}))

    # ---- decode + heads ----
    f2, p2 = feats[::-1], pos[::-1]
    lowered = decode.lower(params, feats, pos, f2, p2)
    compiled = lowered.compile()
    dec_flops = _xla_flops(compiled)
    if dec_flops is None:
        _, dec_flops = analytic_flops(cfg, h, w, bs)
    r1, r2 = decode(params, feats, pos, f2, p2)
    float(jnp.sum(r1["pts3d"][:1, :1, :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for r in range(args.reps):
        r1, r2 = decode(params, feats + jnp.asarray(1e-6 * (r + 1), dtype),
                        pos, f2, p2)
    float(jnp.sum(r1["pts3d"][:1, :1, :1].astype(jnp.float32)))
    dt_dec = (time.perf_counter() - t0) / args.reps
    dec_tflops = dec_flops / dt_dec / 1e12
    ms_pair = dt_dec / bs * 1e3
    print(json.dumps({
        "metric": f"mast3r decode+heads ms/pair ({args.dtype}, bs={bs})",
        "value": round(ms_pair, 3), "unit": "ms",
        "tflops_per_s": round(dec_tflops, 1),
        "mfu": round(dec_tflops * 1e12 / peak, 3)}))

    # ---- workload table: complete symmetrized pair sweeps ----
    # Small scenes cannot fill the big batch (a 3-view scene has 3 images
    # / 6 directed pairs), so per-view-count numbers are MEASURED at the
    # true operating shapes: encode at bs=min(v, bs), full decode batches
    # at bs plus one measured partial batch for the remainder — not a
    # projection from the saturated per-pair rate (VERDICT r4 item 3).
    enc_cache = {bs: dt_enc}
    dec_cache = {bs: dt_dec}

    def enc_time(b):
        if b not in enc_cache:
            im = jnp.asarray(rng.random((b, h, w, 3), np.float32), dtype)
            f, _ = encode(params, im)
            float(jnp.sum(f[:1, :1].astype(jnp.float32)))
            t0 = time.perf_counter()
            for r in range(args.reps):
                f, _ = encode(params, im + jnp.asarray(1e-6 * (r + 1),
                                                       dtype))
            float(jnp.sum(f[:1, :1].astype(jnp.float32)))
            enc_cache[b] = (time.perf_counter() - t0) / args.reps
        return enc_cache[b]

    def dec_time(b):
        if b not in dec_cache:
            fb, pb = feats[:1].repeat(b, 0), pos[:1].repeat(b, 0)
            r1b, _ = decode(params, fb, pb, fb, pb)
            float(jnp.sum(r1b["pts3d"][:1, :1, :1].astype(jnp.float32)))
            t0 = time.perf_counter()
            for r in range(args.reps):
                r1b, _ = decode(params,
                                fb + jnp.asarray(1e-6 * (r + 1), dtype),
                                pb, fb, pb)
            float(jnp.sum(r1b["pts3d"][:1, :1, :1].astype(jnp.float32)))
            dec_cache[b] = (time.perf_counter() - t0) / args.reps
        return dec_cache[b]

    for v in args.views:
        pairs = v * (v - 1)
        enc_s = 0.0
        ve = v
        while ve > 0:
            b = min(ve, bs)
            enc_s += enc_time(b)
            ve -= b
        dec_s = (pairs // bs) * dec_time(bs)
        if pairs % bs:
            dec_s += dec_time(pairs % bs)
        total_s = enc_s + dec_s
        print(json.dumps({
            "metric": f"stage-1 chip seconds @ {v} views "
                      f"({pairs} directed pairs, true batch shapes)",
            "value": round(total_s, 2), "unit": "s",
            "encode_s": round(enc_s, 3), "decode_s": round(dec_s, 3)}))

    combined = (enc_flops + dec_flops) / (dt_enc + dt_dec)
    print(json.dumps({
        "metric": "mast3r stage-1 MFU (encode+decode weighted)",
        "value": round(combined / peak, 3), "unit": "frac_of_peak",
        "tflops_per_s": round(combined / 1e12, 1),
        "flops_source": "xla" if _xla_flops(compiled) else "analytic"}))


if __name__ == "__main__":
    main()
