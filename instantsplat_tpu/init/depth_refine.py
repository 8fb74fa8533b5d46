"""Depth refinement + triangulation utilities (mast3r cloud_opt family).

Compact TPU-native counterparts of mast3r/cloud_opt/tsdf_optimizer.py and
mast3r/cloud_opt/triangulation.py (used by the MASt3R demo pipeline;
InstantSplat proper never calls them — provided for toolset completeness):

- `tsdf_refine_depth`: nudge each view's depth map toward the truncated
  signed-distance consensus of the other views — each pixel's 3D point is
  projected into every other view, the signed depth difference is
  truncated at +-trunc, confidence-weighted, and averaged into a
  correction. One jitted update, iterated a few times (the reference
  instead runs an Adam loop over per-pixel TSDF residuals; same fixed
  point, fewer moving parts).
- `triangulate_matches`: midpoint triangulation of matched pixel pairs
  given intrinsics + c2w poses (triangulation.py's role for two-view
  match lifting).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("n_iter",))
def tsdf_refine_depth(depthmaps, intrinsics, c2w, confs=None, trunc=0.1,
                      lr=0.5, n_iter: int = 3):
    """depthmaps [V,H,W], intrinsics [V,3,3], c2w [V,4,4],
    confs [V,H,W] (optional weights) -> refined [V,H,W]."""
    depthmaps = jnp.asarray(depthmaps, jnp.float32)
    K = jnp.asarray(intrinsics, jnp.float32)
    c2w = jnp.asarray(c2w, jnp.float32)
    v, h, w = depthmaps.shape
    if confs is None:
        confs = jnp.ones((v, h, w), jnp.float32)
    w2c = jnp.linalg.inv(c2w)
    gx, gy = jnp.meshgrid(jnp.arange(w), jnp.arange(h))
    grid = jnp.stack([gx, gy], -1).astype(jnp.float32)  # [H,W,2]

    def unproject(d, Ki, c2wi):
        xy = (grid - K_pp(Ki)) / K_f(Ki)
        pts = jnp.concatenate([xy * d[..., None], d[..., None]], -1)
        return pts.reshape(-1, 3) @ c2wi[:3, :3].T + c2wi[:3, 3]

    def K_f(Ki):
        return jnp.stack([Ki[0, 0], Ki[1, 1]])

    def K_pp(Ki):
        return jnp.stack([Ki[0, 2], Ki[1, 2]])

    def one_iter(_, d):
        def per_view(i):
            pts_w = unproject(d[i], K[i], c2w[i])  # [HW, 3]

            def vs_other(j):
                pc = pts_w @ w2c[j, :3, :3].T + w2c[j, :3, 3]
                z = pc[:, 2]
                uv = pc[:, :2] / jnp.maximum(z[:, None], 1e-6) * K_f(
                    K[j]) + K_pp(K[j])
                ui = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), 0,
                              w - 1)
                vi = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), 0,
                              h - 1)
                dj = d[j][vi, ui]
                cj = confs[j][vi, ui]
                inside = ((uv[:, 0] >= 0) & (uv[:, 0] < w)
                          & (uv[:, 1] >= 0) & (uv[:, 1] < h) & (z > 0))
                # signed distance along the ray, truncated
                sd = jnp.clip(dj - z, -trunc, trunc)
                valid = inside & (jnp.abs(dj - z) < 2 * trunc) & (j != i)
                wgt = jnp.where(valid, cj, 0.0)
                return sd * wgt, wgt

            sds, wgts = jax.vmap(vs_other)(jnp.arange(v))
            corr = jnp.sum(sds, 0) / jnp.maximum(jnp.sum(wgts, 0), 1e-8)
            # correction is along the other view's ray; scale to this
            # view's depth axis via z ratio ~ 1 (small-baseline regime)
            return d[i] + lr * corr.reshape(h, w)

        return jax.vmap(per_view)(jnp.arange(v))

    return jax.lax.fori_loop(0, n_iter, one_iter, depthmaps)


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
