"""Sparse (correspondence-based) global alignment.

Compact TPU-native counterpart of MASt3R's sparse global aligner
(mast3r/cloud_opt/sparse_ga.py:118-463 `sparse_global_alignment` — the
fast alignment path used by the MASt3R demo; InstantSplat's init_geo uses
the dense PointCloudOptimizer instead, SURVEY.md §2.4). Captures the same
structure at a fraction of the machinery:

1. reciprocal descriptor matching per directed edge (ops/matching.py —
   the fast_nn.py core) on a subsampled anchor grid;
2. each match contributes a 3D constraint: anchor pixel x1's point in
   image i's own frame must coincide with anchor pixel x2's point in
   image j's own frame once both are mapped to world by their cam2world
   sim3s;
3. jointly optimize per-image (quat, signed-log1p trans, log scale) by
   confidence-weighted robust L1 over all matches — one jitted Adam
   fori_loop, like the dense aligner.

Deviations from the reference (documented): no coarse-to-fine crop
refinement, no kinematic-chain pose graphs, and a 3D point-coincidence
loss instead of the reference's mixed 3D + 2D-reprojection objective —
the correspondence extraction and the optimize-poses-from-matches
structure are the capability being provided.
"""

from __future__ import annotations

import functools

import numpy as np

from instantsplat_tpu.init import geometry as G
from instantsplat_tpu.ops.matching import fast_reciprocal_nns


def extract_matches(preds, subsample=8):
    """Match descriptors for each directed edge of a PairPrediction that
    carries desc_i/desc_j (models/mast3r_infer attaches them).

    Returns per-edge (xy1 [M,2], xy2 [M,2]) pixel coordinate arrays.
    """
    assert hasattr(preds, "desc_i"), "PairPrediction lacks descriptors"
    out = []
    for e in range(len(preds.edges)):
        xy1, xy2 = fast_reciprocal_nns(
            preds.desc_i[e], preds.desc_j[e], subsample=subsample)
        out.append((xy1, xy2))
    return out


def sparse_global_alignment(preds, matches=None, subsample=8, niter=200,
                            lr=0.01, lr_min=1e-6, seed=0,
                            robust_delta=0.1):
    """-> (c2w [V,4,4], scales [V], final_loss).

    preds: PairPrediction with descriptors; view 0 anchors the gauge.
    """
    import jax
    import jax.numpy as jnp

    from instantsplat_tpu.utils import transforms as T

    if matches is None:
        matches = extract_matches(preds, subsample=subsample)
    v = preds.n_imgs
    h, w = preds.imshape

    # constraint list: (img_i, pt_in_i_frame, img_j, pt_in_j_frame, weight)
    own = {}  # own-frame pointmaps per image (from its directed edges)
    conf_own = {}
    for e, (i, j) in enumerate(preds.edges):
        if i not in own:
            own[i] = preds.pred_i[e]
            conf_own[i] = preds.conf_i[e]
    ai, aj, pi, pj, wgt = [], [], [], [], []
    for e, (i, j) in enumerate(preds.edges):
        xy1, xy2 = matches[e]
        if len(xy1) == 0:
            continue
        # x1's 3D point in i's own frame; x2's 3D point in j's own frame
        p_i = own[i][xy1[:, 1], xy1[:, 0]]
        p_j = own[j][xy2[:, 1], xy2[:, 0]]
        c = np.minimum(conf_own[i][xy1[:, 1], xy1[:, 0]],
                       conf_own[j][xy2[:, 1], xy2[:, 0]])
        ai.append(np.full(len(xy1), i))
        aj.append(np.full(len(xy1), j))
        pi.append(p_i)
        pj.append(p_j)
        wgt.append(np.log(np.clip(c, 1e-8, None)))
    ai = jnp.asarray(np.concatenate(ai), jnp.int32)
    aj = jnp.asarray(np.concatenate(aj), jnp.int32)
    pi = jnp.asarray(np.concatenate(pi), jnp.float32)
    pj = jnp.asarray(np.concatenate(pj), jnp.float32)
    wgt = jnp.asarray(np.concatenate(wgt), jnp.float32)

    rng = np.random.default_rng(seed)
    params = jnp.asarray(
        np.concatenate([
            np.tile([1, 0, 0, 0, 0, 0, 0, 0], (v, 1))
            + rng.standard_normal((v, 8)) * 0.01,
        ], 1), jnp.float32)

    def decode(p):
        q = T.quat_normalize(p[:, :4])
        R = T.quat_to_rotmat(q)
        t = G.signed_expm1(p[:, 4:7])
        s = jnp.exp(p[:, 7])
        return R, t, s

    def loss_fn(p):
        # gauge: fix image 0 (identity, unit scale) by masking its params
        mask = (jnp.arange(v) > 0).astype(jnp.float32)[:, None]
        wp = p * mask + jnp.asarray(
            [1, 0, 0, 0, 0, 0, 0, 0], jnp.float32)[None] * (1 - mask)
        R, t, s = decode(wp)
        # world points of each side
        w1 = jnp.einsum("nij,nj->ni", R[ai], pi) * s[ai][:, None] + t[ai]
        w2 = jnp.einsum("nij,nj->ni", R[aj], pj) * s[aj][:, None] + t[aj]
        d = jnp.sqrt(jnp.sum((w1 - w2) ** 2, -1) + 1e-12)
        # Huber: reciprocal-NN matching produces occasional gross outliers
        # (repetitive texture); cap their influence
        hub = jnp.where(d <= robust_delta, 0.5 * d * d / robust_delta,
                        d - 0.5 * robust_delta)
        return jnp.sum(hub * wgt) / jnp.maximum(jnp.sum(wgt), 1e-8)

    @functools.partial(jax.jit, static_argnames=("niter",))
    def run(p, niter: int):
        m = jnp.zeros_like(p)
        vv = jnp.zeros_like(p)

        def step(it, carry):
            p, m, vv = carry
            tt = it.astype(jnp.float32)
            cur = lr_min + (lr - lr_min) * (
                1 + jnp.cos(jnp.pi * tt / niter)) / 2
            l, g = jax.value_and_grad(loss_fn)(p)
            m = 0.9 * m + 0.1 * g
            vv = 0.9 * vv + 0.1 * g * g
            bc1 = 1 - 0.9 ** (tt + 1)
            upd = cur * (m / bc1) / (jnp.sqrt(vv / bc1) + 1e-8)
            return p - upd, m, vv

        p, m, vv = jax.lax.fori_loop(0, niter, step, (p, m, vv))
        return p, loss_fn(p)

    params, final = run(params, niter)
    params = np.array(params, copy=True)
    params[0] = [1, 0, 0, 0, 0, 0, 0, 0]  # gauge anchor
    c2w = []
    scales = np.exp(params[:, 7])
    from instantsplat_tpu.data.colmap import qvec_to_rotmat

    for k in range(v):
        q = params[k, :4] / np.linalg.norm(params[k, :4])
        # numpy: per-view eager jnp would dispatch tiny ops to the device
        # (see transforms.matrix_to_pose_np docstring)
        Rk = qvec_to_rotmat(q)
        m = np.eye(4)
        m[:3, :3] = Rk
        m[:3, 3] = G.signed_expm1(params[k, 4:7].astype(np.float64))
        c2w.append(m)
    return np.stack(c2w), scales, float(final)
