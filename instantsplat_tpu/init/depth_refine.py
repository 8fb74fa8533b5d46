"""Depth refinement + triangulation utilities (mast3r cloud_opt family).

TPU-native counterparts of mast3r/cloud_opt/tsdf_optimizer.py and
mast3r/cloud_opt/triangulation.py (used by the MASt3R demo pipeline;
InstantSplat proper never calls them — provided for toolset completeness):

- `tsdf_refine_depth`: the reference's TSDF zero-level random search
  (tsdf_optimizer.py:34-82 `_refine_depths_with_TSDF` + :84-112
  `_TSDF_query`): per pixel, sample candidate depths around the current
  estimate with a threshold-scaled spread, evaluate the confidence-
  weighted multi-view TSDF at each candidate's 3D point, and keep the
  candidate whose |TSDF| is closest to zero; flat/unseen pixels (every
  sample at the truncation floor) are left untouched. The per-view torch
  loop + 1e7-point batching becomes one jitted vmap over views with a
  lax.map over sample chunks.
- `triangulate_matches`: midpoint triangulation of matched pixel pairs
  given intrinsics + c2w poses (triangulation.py's role for two-view
  match lifting).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(
    jax.jit, static_argnames=("n_iter", "nsamples", "sample_chunk"))
def tsdf_refine_depth(depthmaps, intrinsics, c2w, confs=None, trunc=0.1,
                      n_iter: int = 1, nsamples: int = 128,
                      sample_chunk: int = 32, key=None):
    """depthmaps [V,H,W], intrinsics [V,3,3], c2w [V,4,4],
    confs [V,H,W] (linear weights; the reference stores log-confs and
    exponentiates, tsdf_optimizer.py:105) -> refined [V,H,W].

    Semantics match the reference exactly (tsdf_optimizer.py:46-82):
    iteration `it` searches with threshold (n_iter - it) * trunc, offsets
    ~ (N(0,1) - 1) * curthresh, the TSDF is clip(pred_depth - proj_depth,
    -curthresh, +inf) averaged over views where the point is seen
    (SDF >= -curthresh) and in-bounds, and queries always read the
    ORIGINAL depthmaps (the reference's _get_depthmaps(None)), so views
    refine independently.
    """
    depthmaps = jnp.asarray(depthmaps, jnp.float32)
    K = jnp.asarray(intrinsics, jnp.float32)
    c2w = jnp.asarray(c2w, jnp.float32)
    v, h, w = depthmaps.shape
    if confs is None:
        confs = jnp.ones((v, h, w), jnp.float32)
    if key is None:
        key = jax.random.PRNGKey(0)
    w2c = jnp.linalg.inv(c2w)
    gx, gy = jnp.meshgrid(jnp.arange(w), jnp.arange(h))
    grid = jnp.stack([gx, gy], -1).astype(jnp.float32)  # [H,W,2]

    def K_f(Ki):
        return jnp.stack([Ki[0, 0], Ki[1, 1]])

    def K_pp(Ki):
        return jnp.stack([Ki[0, 2], Ki[1, 2]])

    def tsdf_query(q, curthresh):
        """[N,3] world points -> (tsdf [N], valid [N]);
        tsdf_optimizer.py:84-112."""

        def per_view(j):
            pc = q @ w2c[j, :3, :3].T + w2c[j, :3, 3]
            z = pc[:, 2]
            uv = pc[:, :2] / jnp.maximum(z[:, None], 1e-6) * K_f(
                K[j]) + K_pp(K[j])
            ui = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), 0, w - 1)
            vi = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), 0, h - 1)
            inside = ((uv[:, 0] >= -0.5) & (uv[:, 0] < w - 0.5)
                      & (uv[:, 1] >= -0.5) & (uv[:, 1] < h - 0.5)
                      & (z > 0))
            sdf = depthmaps[j][vi, ui] - z
            unseen = sdf < -curthresh  # visibility handling
            tsdf = jnp.maximum(sdf, -curthresh)  # clip(-thresh, +inf)
            wgt = jnp.where(inside & ~unseen, confs[j][vi, ui], 0.0)
            return tsdf * wgt, wgt

        ts, ws = jax.vmap(per_view)(jnp.arange(v))
        wsum = jnp.sum(ws, 0)
        valid = wsum > 0
        return jnp.sum(ts, 0) / jnp.maximum(wsum, 1e-20), valid

    def refine_view(dm, Ki, c2wi, kv, curthresh):
        offs = (jax.random.normal(kv, (h, w, nsamples)) - 1.0) * curthresh
        newdm = dm[..., None] + offs  # [H,W,S]

        def eval_chunk(nd):  # [H,W,C] candidate depths -> |tsdf| or inf
            xy = (grid - K_pp(Ki)) / K_f(Ki)
            pts = jnp.concatenate(
                [xy[..., None, :] * nd[..., None], nd[..., None]], -1)
            pts = pts.reshape(-1, 3) @ c2wi[:3, :3].T + c2wi[:3, 3]
            tsdf, valid = tsdf_query(pts, curthresh)
            return jnp.where(valid, jnp.abs(tsdf),
                             jnp.inf).reshape(h, w, -1)

        nc = max(nsamples // sample_chunk, 1)
        chunks = jnp.moveaxis(
            newdm.reshape(h, w, nc, -1), 2, 0)  # [nc,H,W,C]
        tsdf_abs = jnp.moveaxis(jax.lax.map(eval_chunk, chunks),
                                0, 2).reshape(h, w, nsamples)
        mins = jnp.argmin(tsdf_abs, -1)
        # flat zone: every sample sits at the truncation floor -> no move
        allbad = jnp.sum(tsdf_abs == curthresh, -1) == nsamples
        best = jnp.take_along_axis(newdm, mins[..., None], -1)[..., 0]
        return jnp.where(allbad, dm, best)

    out = depthmaps
    for it in range(n_iter):
        curthresh = (n_iter - it) * trunc
        key, sub = jax.random.split(key)
        kv = jax.random.split(sub, v)
        out = jax.vmap(refine_view, in_axes=(0, 0, 0, 0, None))(
            out, K, c2w, kv, curthresh)
    return out


def triangulate_matches(xy1, xy2, K1, K2, c2w1, c2w2):
    """Midpoint triangulation -> ([M,3] world points, [M] ray distances).

    The distance between the two closest ray points is the reprojection
    disagreement (useful as an outlier score, like the reference's
    matches_to_depths consistency checks).
    """
    def rays(xy, K, c2w):
        xy = np.asarray(xy, np.float64)
        d = np.stack([
            (xy[:, 0] - K[0, 2]) / K[0, 0],
            (xy[:, 1] - K[1, 2]) / K[1, 1],
            np.ones(len(xy)),
        ], -1)
        d = d @ np.asarray(c2w)[:3, :3].T
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o = np.broadcast_to(np.asarray(c2w)[:3, 3], d.shape)
        return o, d

    o1, d1 = rays(xy1, K1, c2w1)
    o2, d2 = rays(xy2, K2, c2w2)
    # closest points on the two lines: solve 2x2 system per match
    b = o2 - o1
    d11 = np.sum(d1 * d1, -1)
    d12 = np.sum(d1 * d2, -1)
    d22 = np.sum(d2 * d2, -1)
    denom = d11 * d22 - d12 * d12
    denom = np.where(np.abs(denom) < 1e-12, 1e-12, denom)
    t1 = (np.sum(b * d1, -1) * d22 - np.sum(b * d2, -1) * d12) / denom
    t2 = (np.sum(b * d1, -1) * d12 - np.sum(b * d2, -1) * d11) / denom
    p1 = o1 + t1[:, None] * d1
    p2 = o2 + t2[:, None] * d2
    return 0.5 * (p1 + p2), np.linalg.norm(p1 - p2, axis=-1)
