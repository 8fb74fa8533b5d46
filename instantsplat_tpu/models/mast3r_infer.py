"""Batched pairwise MASt3R inference -> PairPrediction for the aligner.

Replaces dust3r/inference.py:55-72 (per-pair batches through the full
model) with a TPU-friendly two-phase schedule:

1. encode every unique image ONCE ([V, S, D] encoder pass — the reference
   instead encodes each image per pair, halved by the symmetrization trick,
   dust3r/model.py:152-169; encode-once is strictly less work);
2. run the dual decoder + heads over the E directed pairs in fixed-size
   jitted batches, gathering cached encoder tokens per pair.

Pairs are independent, so the batch dimension shards trivially across a
device mesh (SURVEY.md §2.2 pair-parallel mapping): with N devices the
pair batch is padded to a multiple of N and jit partitions it via
jax.sharding when a mesh is passed.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from instantsplat_tpu.init.aligner import PairPrediction
from instantsplat_tpu.models import mast3r


@functools.lru_cache(maxsize=8)
def _encode_jit(cfg: mast3r.MASt3RConfig):
    """Cached jitted encoder (cfg is a hashable frozen dataclass) — a jit
    created per call would recompile the full ViT every invocation."""
    return jax.jit(lambda p, im: mast3r.encode_images(p, cfg, im))


@functools.lru_cache(maxsize=32)
def _decode_jit(cfg: mast3r.MASt3RConfig, h: int, w: int,
                h2: int | None = None, w2: int | None = None):
    return jax.jit(
        lambda p, f1, p1, f2, p2: mast3r.forward_from_encoded(
            p, cfg, f1, p1, f2, p2, h, w, h2, w2))


def infer_pairs(
    params,
    cfg: mast3r.MASt3RConfig,
    images,
    pairs,
    batch_size: int = 8,
    mesh=None,
    dtype=None,
) -> PairPrediction:
    """images [V, H, W, 3] in [0,1] (or a list of same-shape images);
    pairs: [(i, j)] directed. For images of MIXED shapes (portrait +
    landscape in one scene) call `infer_pairs_mixed` — its per-edge maps
    have per-image shapes, which PairPrediction's stacked arrays cannot
    represent, so this function refuses mixed lists rather than silently
    returning a different type.

    dtype=jnp.bfloat16 runs the transformer in mixed precision (weights +
    activations bf16, LayerNorm/softmax statistics and head postprocess
    f32) — ~2x MXU throughput for the stage-1 hot loop."""
    if isinstance(images, (list, tuple)):
        shapes = {tuple(np.asarray(im).shape[:2]) for im in images}
        if len(shapes) > 1:
            raise TypeError(
                f"infer_pairs got images of mixed shapes {sorted(shapes)}; "
                "its PairPrediction return type holds same-shape stacked "
                "maps. Use models.mast3r_infer.infer_pairs_mixed (returns "
                "one dict per pair, each map in its own image's shape)."
            )
        images = np.stack([np.asarray(im) for im in images])
    images = jnp.asarray(images, jnp.float32)
    if dtype is not None:
        params = mast3r.cast_params(params, dtype)
        images = images.astype(dtype)
    v, h, w, _ = images.shape

    encode = _encode_jit(cfg)
    feats, pos = encode(params, images)

    decode = _decode_jit(cfg, int(h), int(w))

    e = len(pairs)
    # larger pair batches raise decode MFU (measured 21.6 -> 15.0 ms/pair
    # from bs 8 -> 24 on v5e), but never pad a small scene past its edges
    batch_size = max(1, min(batch_size, e))
    if mesh is not None:
        # pair-DP sharding splits the batch over the mesh axis: the batch
        # must be a device-count multiple (small scenes pad up to it)
        ndev = mesh.devices.size
        batch_size = max(ndev, -(-batch_size // ndev) * ndev)
    ei = np.array([i for i, _ in pairs])
    ej = np.array([j for _, j in pairs])
    n_pad = ((e + batch_size - 1) // batch_size) * batch_size
    ei_p = np.pad(ei, (0, n_pad - e), constant_values=0)
    ej_p = np.pad(ej, (0, n_pad - e), constant_values=0)

    pred_i = np.empty((e, h, w, 3), np.float32)
    pred_j = np.empty((e, h, w, 3), np.float32)
    conf_i = np.empty((e, h, w), np.float32)
    conf_j = np.empty((e, h, w), np.float32)
    desc_i = np.empty((e, h, w, cfg.local_feat_dim), np.float32)
    desc_j = np.empty((e, h, w, cfg.local_feat_dim), np.float32)

    sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = list(mesh.axis_names)[0]
        sharding = NamedSharding(mesh, P(axis))

    for s in range(0, n_pad, batch_size):
        bi = ei_p[s:s + batch_size]
        bj = ej_p[s:s + batch_size]
        f1, p1 = feats[bi], pos[bi]
        f2, p2 = feats[bj], pos[bj]
        if sharding is not None:
            f1, f2 = jax.device_put((f1, f2), sharding)
        r1, r2 = decode(params, f1, p1, f2, p2)
        n = min(batch_size, e - s)
        if n <= 0:
            break
        pred_i[s:s + n] = np.asarray(r1["pts3d"][:n])
        pred_j[s:s + n] = np.asarray(r2["pts3d"][:n])
        conf_i[s:s + n] = np.asarray(r1["conf"][:n])
        conf_j[s:s + n] = np.asarray(r2["conf"][:n])
        desc_i[s:s + n] = np.asarray(r1["desc"][:n])
        desc_j[s:s + n] = np.asarray(r2["desc"][:n])

    out = PairPrediction(
        edges=[tuple(p) for p in pairs],
        pred_i=pred_i, pred_j=pred_j, conf_i=conf_i, conf_j=conf_j)
    out.desc_i = desc_i  # descriptor maps (mast3r extra outputs)
    out.desc_j = desc_j
    return out


def infer_pairs_mixed(
    params,
    cfg: mast3r.MASt3RConfig,
    images,
    pairs,
    batch_size: int = 8,
    dtype=None,
):
    """Pairwise inference over a MIXED-shape image set.

    The reference collates mixed-shape scenes by forcing batch_size=1
    (dust3r/inference.py:62-64). TPU-first version: group images by shape
    and encode each group as one batch; group directed pairs by their
    (shape_i, shape_j) signature and decode each group in fixed-size jitted
    batches (one compiled program per distinct shape pair — a scene mixes
    at most a handful). Portrait images run in their true orientation,
    numerically equal to the reference's ManyAR transpose scheme (see
    models/mast3r.py encode_images note + tests/test_mast3r.py).

    Args:
      images: list of [H_i, W_i, 3] float arrays in [0,1].
      pairs: [(i, j)] directed edges.

    Returns: list (len == len(pairs)) of dicts with keys pred_i, pred_j,
    conf_i, conf_j, desc_i, desc_j — each map in its own image's shape.
    """
    from collections import defaultdict

    if dtype is not None:
        params = mast3r.cast_params(params, dtype)

    shapes = [tuple(np.asarray(im).shape[:2]) for im in images]
    encode = _encode_jit(cfg)
    feats: list = [None] * len(images)
    poss: list = [None] * len(images)
    img_groups = defaultdict(list)
    for idx, s in enumerate(shapes):
        img_groups[s].append(idx)
    for s, idxs in img_groups.items():
        batch = jnp.asarray(
            np.stack([np.asarray(images[i], np.float32) for i in idxs]))
        if dtype is not None:
            batch = batch.astype(dtype)
        f, p = encode(params, batch)
        for k, i in enumerate(idxs):
            feats[i], poss[i] = f[k], p[k]

    edge_groups = defaultdict(list)
    for e, (i, j) in enumerate(pairs):
        edge_groups[(shapes[i], shapes[j])].append(e)

    results: list = [None] * len(pairs)
    for (si, sj), eidx in edge_groups.items():
        decode = _decode_jit(cfg, si[0], si[1], sj[0], sj[1])
        bs = min(batch_size, len(eidx))
        for s0 in range(0, len(eidx), bs):
            chunk = eidx[s0:s0 + bs]
            sel = chunk + [chunk[0]] * (bs - len(chunk))  # pad: stable jit shape
            f1 = jnp.stack([feats[pairs[e][0]] for e in sel])
            p1 = jnp.stack([poss[pairs[e][0]] for e in sel])
            f2 = jnp.stack([feats[pairs[e][1]] for e in sel])
            p2 = jnp.stack([poss[pairs[e][1]] for e in sel])
            r1, r2 = decode(params, f1, p1, f2, p2)
            for k, e in enumerate(chunk):
                results[e] = dict(
                    pred_i=np.asarray(r1["pts3d"][k], np.float32),
                    pred_j=np.asarray(r2["pts3d"][k], np.float32),
                    conf_i=np.asarray(r1["conf"][k], np.float32),
                    conf_j=np.asarray(r2["conf"][k], np.float32),
                    desc_i=np.asarray(r1["desc"][k], np.float32),
                    desc_j=np.asarray(r2["desc"][k], np.float32),
                )
    return results


def make_pointmap_fn(ckpt_path: str, batch_size: int = 8,
                     cfg: Optional[mast3r.MASt3RConfig] = None, mesh=None,
                     dtype=None):
    """-> pointmap_fn(images, pairs) for pipelines.init_geo_pipeline."""
    cfg = cfg or mast3r.MASt3RConfig()
    if ckpt_path and (ckpt_path == "random" or ckpt_path.startswith("random:")):
        # Benchmark/dev path: the full production architecture with random
        # weights ("random" or "random:SEED"). Geometry is garbage but the
        # compute is the production compute — scripts/bench_e2e.py uses
        # this to measure pipeline wall times in an environment that ships
        # no pretrained checkpoints.
        seed = int(ckpt_path.split(":", 1)[1]) if ":" in ckpt_path else 0
        params = mast3r.init_params(cfg, seed=seed)
    elif not ckpt_path:
        raise RuntimeError(
            "init_geo needs a MASt3R checkpoint (--ckpt_path). This "
            "environment ships no pretrained weights; point --ckpt_path at "
            "MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric.pth (converted "
            "on load), pass --ckpt_path random for a random-weight "
            "benchmarking run, or initialize the scene with an externally "
            "produced sparse_{n} directory."
        )
    else:
        params = mast3r.load_checkpoint(ckpt_path, cfg)

    def fn(images, pairs):
        if isinstance(images, (list, tuple)) and len(
                {np.asarray(im).shape[:2] for im in images}) > 1:
            results = infer_pairs_mixed(params, cfg, images, pairs,
                                        batch_size=batch_size, dtype=dtype)
            shapes = np.array([np.asarray(im).shape[:2] for im in images])
            return mixed_results_to_prediction(results, pairs, shapes)
        return infer_pairs(params, cfg, np.asarray(images), pairs,
                           batch_size=batch_size, mesh=mesh, dtype=dtype)

    return fn


def mixed_results_to_prediction(results, pairs, shapes):
    """Assemble infer_pairs_mixed's per-pair maps (each in its image's own
    raster) into a canvas-padded PairPrediction for the aligner: maps at
    the top-left of a (Hmax, Wmax) canvas, confidence padding = 1.0 (zero
    log-conf loss weight — see PairPrediction.shapes)."""
    from instantsplat_tpu.data.images import pad_to_canvas

    shapes = np.asarray(shapes)
    canvas = (int(shapes[:, 0].max()), int(shapes[:, 1].max()))
    pred_i = pad_to_canvas([r["pred_i"] for r in results], canvas)
    pred_j = pad_to_canvas([r["pred_j"] for r in results], canvas)
    conf_i = pad_to_canvas([r["conf_i"] for r in results], canvas, fill=1.0)
    conf_j = pad_to_canvas([r["conf_j"] for r in results], canvas, fill=1.0)
    return PairPrediction(
        edges=[tuple(p) for p in pairs], pred_i=pred_i, pred_j=pred_j,
        conf_i=conf_i, conf_j=conf_j, shapes=np.asarray(shapes))
