"""Sparse (correspondence-based) global alignment.

TPU-native counterpart of MASt3R's sparse global aligner
(mast3r/cloud_opt/sparse_ga.py:118-463 `sparse_global_alignment` — the
fast alignment path used by the MASt3R demo; InstantSplat's init_geo uses
the dense PointCloudOptimizer instead, SURVEY.md §2.4). Structure:

1. reciprocal descriptor matching per directed edge (ops/matching.py —
   the fast_nn.py core) on a subsampled anchor grid, optionally refined
   coarse-to-fine on crop pairs (`refine_matches_coarse_to_fine`, the
   mast3r/utils/coarse_to_fine.py capability);
2. each match contributes a constraint between the two images' sim3s;
   edges whose matching is too weak fall back to a dense grid-anchor
   DUSt3R-regression term at weight `loss_dust3r_w` (sparse_ga.py:
   307-315 loss_dust3r + matching_conf_thr gating);
3. two-phase optimization mirroring sparse_ga.py:440-453:
   - COARSE (niter1, lr1, gamma_loss(1.1)): 3D point-coincidence over
     matched anchors, poses + scales only (sparse_ga.py:355-380 loss_3d);
   - FINE (niter2, lr2, gamma_loss(0.4)): 2D-reprojection of the matched
     points into the opposite image against the matched pixel coords
     (sparse_ga.py:377-392 loss_2d), now also optimizing per-image
     log-focals and principal points (sparse_ga.py:444-449).
   Each phase is one jitted Adam fori_loop, like the dense aligner.

Poses are parameterized as a kinematic chain over the match-strength MST
(sparse_ga.py:254-260): each image's learnable (quat, trans) is RELATIVE
to its MST parent and absolute poses are composed along the tree inside
the jitted loss, so a parent update moves its whole subtree coherently
(the conditioning win the reference gets from the chain). Set
`kinematic_chain=False` for free per-image poses.

Per-pixel depth optimization (sparse_ga.py:355-392 core_depth, trainable
in the fine phase only, sparse_ga.py:440-453): the reference stores
per-anchor depth values on a `subsample` grid and unprojects matched
pixels through them. Here each constraint point carries a learnable
per-anchor-cell LOG DEPTH SCALE — scaling a camera-frame point moves it
along its own pixel ray (pinhole invariant), so `p_eff = p * exp(dscale)`
is exactly the reference's anchor-grid depth freedom without re-deriving
rays, and it stays one fixed-shape [V * n_cells] tensor for XLA. Frozen
in the coarse phase, optimized in the fine phase (opt_depth=True).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

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


# -- coarse-to-fine crop refinement (mast3r/utils/coarse_to_fine.py) -------

def _multiple_of_16(x):
    return max((int(x) // 16) * 16, 16)


def _start_positions(total, win, overlap):
    """First window at 0, last at total-win, spacing <= win*(1-overlap)
    (coarse_to_fine.py:18-26)."""
    if total <= win:
        return np.zeros(1, int)
    spacing = win * (1 - overlap)
    last = total - win
    n = 2 + int((last - 1) // spacing)
    return np.linspace(0, last, n).round().astype(int)


def _overlapping_grid(h, w, maxdim, overlap):
    """[K, 4] crop cells (x0, y0, x1, y1) tiling the image with windows of
    long side `maxdim` (aspect preserved, /16 sizes;
    coarse_to_fine.py:33-40)."""
    scale = maxdim / max(h, w)
    hw = _multiple_of_16(min(h, int(h * scale)))
    ww = _multiple_of_16(min(w, int(w * scale)))
    xs = _start_positions(w, ww, overlap)
    ys = _start_positions(h, hw, overlap)
    gx, gy = np.meshgrid(xs, ys)
    cells = np.stack([gx, gy, gx + ww, gy + hw], -1).reshape(-1, 4)
    return cells


def _center_weight(cells, pts, assigned, gauss_var=2.0):
    """Gaussian down-weighting of matches far from the crop center
    (coarse_to_fine.py:91-101)."""
    center = (cells[:, :2] + cells[:, 2:]) / 2.0
    size = np.maximum(cells[:, 2:] - cells[:, :2], 1.0)
    rel = (pts[None] - center[:, None]) / (size[:, None] / 2.0)
    w = np.exp(-np.sum(rel**2, -1) / (2 * gauss_var))
    return np.where(assigned, w, 0.0)


def select_pairs_of_crops(shape1, shape2, xy1, xy2, maxdim=512,
                          overlap=0.5, min_corres=10, target=0.9):
    """-> list of (cell1 [4], cell2 [4]) int crop rectangles (x0,y0,x1,y1).

    Clean-room equivalent of coarse_to_fine.py:184-215
    `select_pairs_of_crops`: grid the query image into overlapping /16
    windows, estimate each window's corresponding rectangle in the other
    image from the assigned matches' center and 10-90% spread, score by
    center-weighted coverage, run both directions, and greedily pick crop
    pairs until `target` of the total coverable match weight is covered.
    """
    xy1 = np.asarray(xy1, np.float64)
    xy2 = np.asarray(xy2, np.float64)
    if len(xy1) < min_corres:
        return []

    def one_direction(shape_q, shape_b, pq, pb):
        cells_q = _overlapping_grid(*shape_q, maxdim, overlap)
        inside = ((pq[None, :, 0] >= cells_q[:, None, 0])
                  & (pq[None, :, 0] < cells_q[:, None, 2])
                  & (pq[None, :, 1] >= cells_q[:, None, 1])
                  & (pq[None, :, 1] < cells_q[:, None, 3]))
        keep = inside.sum(1) >= min_corres
        cells_q, inside = cells_q[keep], inside[keep]
        if not len(cells_q):
            return (np.zeros((0, 4)), np.zeros((0, 4)),
                    np.zeros((0, len(pq))))
        pb_m = np.where(inside[:, :, None], pb[None], np.nan)
        pq_m = np.where(inside[:, :, None], pq[None], np.nan)
        center_b = np.nanmean(pb_m, axis=1)
        q10_q, q90_q = np.nanquantile(pq_m, (0.1, 0.9), axis=1)
        q10_b, q90_b = np.nanquantile(pb_m, (0.1, 0.9), axis=1)
        std_q = np.clip(q90_q - q10_q, 20.0, None)
        std_b = np.clip(q90_b - q10_b, 20.0, None)
        size_b = (cells_q[:, 2:] - cells_q[:, :2]) * std_b / std_q
        cells_b = np.concatenate(
            [center_b - size_b / 2, center_b + size_b / 2], -1)
        # clip to image, keep /16-friendly bounds
        hb, wb = shape_b
        cells_b[:, 0::2] = np.clip(cells_b[:, 0::2], 0, wb)
        cells_b[:, 1::2] = np.clip(cells_b[:, 1::2], 0, hb)
        weights = (_center_weight(cells_q, pq, inside)
                   * _center_weight(cells_b, pb, inside))
        return cells_q, cells_b, weights

    c1a, c2a, wa = one_direction(shape1, shape2, xy1, xy2)
    c2b, c1b, wb = one_direction(shape2, shape1, xy2, xy1)
    cell1 = np.concatenate([c1a, c1b])
    cell2 = np.concatenate([c2a, c2b])
    weights = np.concatenate([wa, wb])
    if not len(weights):
        return []

    # greedy set cover to `target` coverage (coarse_to_fine.py:156-182)
    w = weights.copy()
    total = w.max(0).sum()
    goal = target * total
    covered = np.zeros(w.shape[1])
    order = []
    while covered.sum() < goal and len(order) < len(w):
        best = int(w.sum(1).argmax())
        if w[best].sum() <= 0:
            break
        order.append(best)
        covered += w[best]
        w = np.clip(w - w[best], 0, None)
    return [(cell1[i].astype(int), cell2[i].astype(int)) for i in order]


def refine_matches_coarse_to_fine(
    img1, img2, xy1, xy2,
    infer_fn: Callable,
    maxdim=512, overlap=0.5, subsample=4, min_corres=10,
):
    """Coarse matches -> finer matches via crop-pair re-inference.

    The reference re-runs the network on selected crop pairs at native
    resolution and re-matches (mast3r fine-matching pipeline around
    coarse_to_fine.select_pairs_of_crops). `infer_fn(crop1, crop2)` must
    return (desc1 [h,w,D], desc2 [h,w,D]) descriptor maps for the two
    crops (any internal resolution; coordinates are rescaled back).

    Returns (xy1_fine [M,2], xy2_fine [M,2]) in FULL-image pixel coords;
    falls back to the coarse matches when no crop pair qualifies.
    """
    crops = select_pairs_of_crops(
        np.asarray(img1).shape[:2], np.asarray(img2).shape[:2],
        xy1, xy2, maxdim=maxdim, overlap=overlap, min_corres=min_corres)
    if not crops:
        return np.asarray(xy1), np.asarray(xy2)
    out1, out2 = [], []
    for cell1, cell2 in crops:
        x0a, y0a, x1a, y1a = cell1
        x0b, y0b, x1b, y1b = cell2
        if x1a - x0a < 16 or y1a - y0a < 16 \
                or x1b - x0b < 16 or y1b - y0b < 16:
            continue
        c1 = np.asarray(img1)[y0a:y1a, x0a:x1a]
        c2 = np.asarray(img2)[y0b:y1b, x0b:x1b]
        d1, d2 = infer_fn(c1, c2)
        m1, m2 = fast_reciprocal_nns(d1, d2, subsample=subsample)
        if not len(m1):
            continue
        s1 = np.array([c1.shape[1] / d1.shape[1],
                       c1.shape[0] / d1.shape[0]])
        s2 = np.array([c2.shape[1] / d2.shape[1],
                       c2.shape[0] / d2.shape[0]])
        out1.append(m1 * s1 + [x0a, y0a])
        out2.append(m2 * s2 + [x0b, y0b])
    if not out1:
        return np.asarray(xy1), np.asarray(xy2)
    f1 = np.concatenate(out1)
    f2 = np.concatenate(out2)
    # overlapping crops produce duplicates: dedup on rounded query coords
    _, idx = np.unique(f1.round().astype(int), axis=0, return_index=True)
    return f1[np.sort(idx)], f2[np.sort(idx)]


# -- two-phase sparse optimizer (sparse_ga.py:158-463) ---------------------


def mst_topo_order(n_imgs, edges, strengths):
    """Maximum-strength spanning tree rooted at image 0, as a traversal.

    -> (order [V] int, parent [V] int; parent[order[0]] = -1). The
    reference builds its kinematic chain from the MST of pairwise match
    confidence (sparse_ga.py:205-211 `compute_min_spanning_tree` over
    `-msp` scores); strengths here are per-directed-edge (higher =
    better), merged to undirected max.
    """
    import scipy.sparse as sp

    g = sp.dok_array((n_imgs, n_imgs))
    for (i, j), s in zip(edges, strengths):
        a, b = (i, j) if i < j else (j, i)
        g[a, b] = min(g[a, b], -float(s)) if g[a, b] else -float(s)
    msp = sp.csgraph.minimum_spanning_tree(g.tocsr()).tocoo()
    adj = [[] for _ in range(n_imgs)]
    for a, b in zip(msp.row, msp.col):
        adj[int(a)].append(int(b))
        adj[int(b)].append(int(a))
    parent = np.full(n_imgs, -1, int)
    order, seen = [0], {0}
    stack = [0]
    while stack:
        u = stack.pop()
        for w in adj[u]:
            if w not in seen:
                seen.add(w)
                parent[w] = u
                order.append(w)
                stack.append(w)
    # disconnected images (no edges at all) chain to the root
    for k in range(n_imgs):
        if k not in seen:
            parent[k] = 0
            order.append(k)
    return np.asarray(order, int), parent


class SparseGAResult(NamedTuple):
    c2w: np.ndarray  # [V, 4, 4]
    scales: np.ndarray  # [V]
    focals: np.ndarray  # [V]
    loss: float
    # fine-phase per-anchor-cell log depth scales [V, ceil(H/ss), ceil(W/ss)]
    # (0 = predicted depth; the reference returns refined depthmaps the
    # same way, sparse_ga.py:436-438). None when opt_depth=False.
    depth_scales: Optional[np.ndarray] = None


def _gamma_np(gamma):
    """Reference gamma_loss (mast3r/cloud_opt/utils/losses.py:19-28):
    (d + offset)^gamma - offset^gamma with unit slope at d=0."""
    import jax.numpy as jnp

    if gamma == 1.0:
        return lambda d: d
    offset = (1.0 / gamma) ** (1.0 / (gamma - 1.0))

    def f(d):
        return (d + offset) ** gamma - offset ** gamma

    return f


def sparse_global_alignment(
    preds,
    matches=None,
    subsample=8,
    niter1=300, lr1=0.07,
    niter2=300, lr2=0.014,
    lr_min=1e-6,
    gamma1=1.1, gamma2=0.4,
    matching_conf_thr=0.0, min_matches=8, loss_dust3r_w=0.01,
    anchor3d_w=10.0,
    focals: Optional[np.ndarray] = None,
    kinematic_chain=True,
    opt_depth=True,
    depth_reg_w=1.0,
    depth_lr_scale=0.3,
    anchor3d_mode="pred",
    seed=0,
):
    """-> SparseGAResult(c2w [V,4,4], scales [V], focals [V], loss).

    preds: PairPrediction with descriptors; view 0 anchors the gauge.
    Phase hyperparameters mirror sparse_ga.py:160-162 (lr1=0.2/niter1=500/
    gamma 1.1; lr2=0.02/niter2=500/gamma 0.4) scaled to this
    parameterization; `focals` overrides the per-image Weiszfeld init.
    `kinematic_chain` parameterizes poses relative to the match-MST parent
    (sparse_ga.py:254-260); False = free per-image poses. `opt_depth`
    optimizes per-anchor-cell depth scales in the fine phase
    (sparse_ga.py:453 opt_depth; see module docstring).

    `anchor3d_mode` controls the fine phase's 3D-coincidence anchor — a
    DOCUMENTED DEVIATION from the reference, whose fine loss is
    reprojection-only (loss_2d, sparse_ga.py:377-392,453) with the metric
    structure held by its kinematic-chain parameterization instead:
      "pred"  (default) 3D term on PREDICTED depths — pins metric
              structure under this module's free-pose parameterization;
      "depth" 3D term on the OPTIMIZED per-anchor depths (what feeding
              core_depth-derived pts3d into loss_3d would do);
      "off"   no fine-phase 3D term (the literal reference fine loss).
    Measured on the exact-pointmap synthetic scene
    (scripts/measure_sparse_anchor.py, CPU, subsample=4, 300+300 iters;
    relative rotation rad / normalized translation / focal error):
      exact-focal init (the production path — aligner focal_avg /
      Weiszfeld both recover it here):
        pred  0.020 / 0.079 / 1.2%   <- best pose by 4x translation
        depth 0.083 / 0.378 / 0.25%
        off   0.067 / 0.325 / 1.2%
      deliberately wrong 0.6x focal init:
        pred  0.065 / 0.364 / 2.0%
        depth 0.045 / 0.395 / 10.0%
        off   0.015 / 0.251 / 1.6%   <- anchoring to predictions made
                                        under a wrong focal hurts
    "pred" stays the default: the production init path feeds good focals,
    where the predicted-depth anchor is the only formulation that holds
    the metric structure under free per-image poses; the deviation
    stands, measured both ways.
    """
    import jax
    import jax.numpy as jnp

    from instantsplat_tpu.utils import transforms as T

    if matches is None:
        matches = extract_matches(preds, subsample=subsample)
    v = preds.n_imgs
    h, w = preds.imshape
    diag = float(np.hypot(h, w))

    # own-frame pointmaps per image (from its directed edges)
    own, conf_own = {}, {}
    for e, (i, j) in enumerate(preds.edges):
        if i not in own:
            own[i] = np.asarray(preds.pred_i[e])
            conf_own[i] = np.asarray(preds.conf_i[e])

    # constraint list over strong (matched) edges + weak-edge fallbacks
    ai, aj, pi, pj, x1, x2, wgt, strong = ([] for _ in range(8))
    gy, gx = np.mgrid[subsample // 2:h:subsample,
                      subsample // 2:w:subsample]
    grid = np.stack([gx.ravel(), gy.ravel()], -1)
    for e, (i, j) in enumerate(preds.edges):
        xy1, xy2 = matches[e]
        c = None
        if len(xy1) >= min_matches:
            c = np.minimum(conf_own[i][xy1[:, 1], xy1[:, 0]],
                           conf_own[j][xy2[:, 1], xy2[:, 0]])
        if c is not None and float(c.max()) > matching_conf_thr:
            ai.append(np.full(len(xy1), i))
            aj.append(np.full(len(xy1), j))
            pi.append(own[i][xy1[:, 1], xy1[:, 0]])
            pj.append(own[j][xy2[:, 1], xy2[:, 0]])
            x1.append(np.asarray(xy1, np.float32))
            x2.append(np.asarray(xy2, np.float32))
            wgt.append(np.log(np.clip(c, 1e-8, None)))
            strong.append(np.ones(len(xy1), bool))
        else:
            # DUSt3R-regression fallback on the anchor grid
            # (sparse_ga.py:307-315): j's points seen in i's frame vs j's
            # own points, both mapped to world by their sim3s
            ai.append(np.full(len(grid), i))
            aj.append(np.full(len(grid), j))
            pi.append(np.asarray(preds.pred_j[e])[grid[:, 1], grid[:, 0]])
            pj.append(own[j][grid[:, 1], grid[:, 0]])
            x1.append(np.asarray(grid, np.float32))
            x2.append(np.asarray(grid, np.float32))
            cw = np.asarray(preds.conf_j[e])[grid[:, 1], grid[:, 0]]
            wgt.append(np.log(np.clip(cw, 1e-8, None)))
            strong.append(np.zeros(len(grid), bool))
    ai_np = np.concatenate(ai)
    aj_np = np.concatenate(aj)
    x1_np = np.concatenate(x1)
    x2_np = np.concatenate(x2)
    ai = jnp.asarray(ai_np, jnp.int32)
    aj = jnp.asarray(aj_np, jnp.int32)
    pi = jnp.asarray(np.concatenate(pi), jnp.float32)
    pj_np_list = pj
    pj = jnp.asarray(np.concatenate(pj), jnp.float32)
    x1 = jnp.asarray(np.concatenate(x1), jnp.float32)
    x2 = jnp.asarray(np.concatenate(x2), jnp.float32)
    wgt = jnp.asarray(np.concatenate(wgt), jnp.float32)
    strong = jnp.asarray(np.concatenate(strong))
    # scene-scale normalizer for the 3D terms: keeps gamma-loss curvature
    # and the 2D/3D weighting unit-free across scenes (the reference pins
    # units via base_scale/global_scaling, sparse_ga.py:263-266)
    scene_norm = float(np.median(np.linalg.norm(
        np.concatenate(pj_np_list), axis=1))) or 1.0
    w_strong = wgt * strong
    w_weak = wgt * (1 - strong)
    n_strong = jnp.maximum(jnp.sum(w_strong), 1e-8)
    n_weak = jnp.maximum(jnp.sum(w_weak), 1e-8)

    # per-anchor-cell depth-scale slots (reference core_depth lives on the
    # same subsample grid, sparse_ga.py:136-147): constraint row -> slot
    # (image, cell). The i-side of a weak row is a cross-frame prediction
    # (pred_j in i's frame), not i's own ray — its slot is gated off by
    # the `strong` flag inside world_points.
    wa = -(-w // subsample)
    n_cells = wa * (-(-h // subsample))

    def _slots(img_arr, xy_arr):
        cy = xy_arr[:, 1].astype(np.int64) // subsample
        cx = xy_arr[:, 0].astype(np.int64) // subsample
        return img_arr.astype(np.int64) * n_cells + cy * wa + cx

    slot_i = jnp.asarray(_slots(ai_np, x1_np), jnp.int32)
    slot_j = jnp.asarray(_slots(aj_np, x2_np), jnp.int32)
    strong_f = strong.astype(jnp.float32)

    # per-image focal init (Weiszfeld on the own-frame pointmap,
    # dust3r/post_process.py:33-56), pp at the image center
    if focals is None:
        f0 = np.empty(v)
        got = {i: G.estimate_focal_weiszfeld(own[i]) for i in sorted(own)}
        mean_f = (float(np.mean(list(got.values())))
                  if got else 0.8 * max(h, w))
        for i in range(v):
            f0[i] = got.get(i, mean_f)
    else:
        f0 = np.broadcast_to(np.asarray(focals, np.float64), (v,)).copy()

    rng = np.random.default_rng(seed)
    params = dict(
        pose=jnp.asarray(
            np.tile([1, 0, 0, 0, 0, 0, 0, 0], (v, 1))
            + rng.standard_normal((v, 8)) * 0.01, jnp.float32),
        log_focal=jnp.asarray(np.log(f0), jnp.float32),
        pp=jnp.asarray(np.tile([w / 2.0, h / 2.0], (v, 1)), jnp.float32),
        # log depth scale per (image, anchor cell); 0 = predicted depth
        log_dscale=jnp.zeros(v * n_cells, jnp.float32),
    )

    # kinematic chain over the match-strength MST (sparse_ga.py:254-260):
    # pose rows are parent-relative, composed along the (static,
    # host-computed) traversal inside the jitted loss.
    chain = []
    if kinematic_chain and v > 1:
        strengths = [
            float(len(matches[e][0]))
            if len(matches[e][0]) >= min_matches else 0.5
            for e in range(len(preds.edges))
        ]
        order_np, parent_np = mst_topo_order(v, preds.edges, strengths)
        assert int(order_np[0]) == 0  # root = gauge anchor
        chain = [(int(k), int(parent_np[k])) for k in order_np[1:]]

    g1 = _gamma_np(gamma1)
    g2 = _gamma_np(gamma2)
    gd = _gamma_np(1.1)  # lossd = gamma_loss(1.1), sparse_ga.py:162

    def decode(p):
        mask = (jnp.arange(v) > 0).astype(jnp.float32)[:, None]
        wp = p["pose"] * mask + jnp.asarray(
            [1, 0, 0, 0, 0, 0, 0, 0], jnp.float32)[None] * (1 - mask)
        q = T.quat_normalize(wp[:, :4])
        R = T.quat_to_rotmat(q)
        t = G.signed_expm1(wp[:, 4:7])
        if chain:
            # compose absolute poses down the tree (unrolled: V <= ~24
            # tiny matmuls, traversal order is static). Root 0's relative
            # pose is the masked identity => absolute identity (gauge).
            Rl, tl = list(R), list(t)
            for k, par in chain:
                Rl[k] = Rl[par] @ R[k]
                tl[k] = Rl[par] @ t[k] + tl[par]
            R = jnp.stack(Rl)
            t = jnp.stack(tl)
        s = jnp.exp(wp[:, 7])
        f = jnp.clip(jnp.exp(p["log_focal"]),
                     0.25 * diag, 10.0 * diag)  # sparse_ga.py:226-228
        return R, t, s, f, p["pp"]

    f0_ref = jnp.asarray(f0, jnp.float32)

    def world_points(R, t, s, dsc, f=None):
        # moving a camera-frame point along its pixel ray == scaling it
        # (the reference's core_depth freedom, sparse_ga.py:355-392). With
        # `f`, depths additionally ride the current/initial focal ratio —
        # the reference's smart reparameterization (sparse_ga.py:243-246
        # z_cameras ∝ focal) that keeps a focal move from fighting every
        # per-anchor depth radially.
        di = dsc[slot_i] * strong_f
        dj = dsc[slot_j]
        if f is not None:
            fr = jnp.log(f / f0_ref)
            di = di + fr[ai] * strong_f
            dj = dj + fr[aj]
        pi_eff = pi * jnp.exp(di)[:, None]
        pj_eff = pj * jnp.exp(dj)[:, None]
        w1 = jnp.einsum("nij,nj->ni", R[ai], pi_eff) * s[ai][:, None] + t[ai]
        w2 = jnp.einsum("nij,nj->ni", R[aj], pj_eff) * s[aj][:, None] + t[aj]
        return w1, w2

    def loss_weak(w1, w2):
        d = jnp.sqrt(jnp.sum((w1 - w2) ** 2, -1) + 1e-12) / scene_norm
        return jnp.sum(gd(d) * w_weak) / n_weak

    def loss_coarse(p):
        R, t, s, _, _ = decode(p)
        w1, w2 = world_points(R, t, s, p["log_dscale"])
        d = jnp.sqrt(jnp.sum((w1 - w2) ** 2, -1) + 1e-12) / scene_norm
        l3d = jnp.sum(g1(d) * w_strong) / n_strong
        return l3d + loss_dust3r_w * loss_weak(w1, w2)

    def reproj(Rk, tk, sk, fk, ppk, world):
        cam = jnp.einsum("nji,nj->ni", Rk, world - tk) / sk[:, None]
        z = jnp.maximum(cam[:, 2], 1e-6)
        return fk[:, None] * cam[:, :2] / z[:, None] + ppk

    def loss_fine(p):
        R, t, s, f, pp = decode(p)
        # depth freedom lives in the REPROJECTION term only (the
        # reference's core_depth feeds loss_2d, sparse_ga.py:377-392); the
        # 3D anchor below stays on the predicted depths so it keeps
        # pinning the metric structure instead of being absorbed by
        # per-anchor depth motion (measured: translation error 0.07 ->
        # 0.35 when the anchor term sees optimized depths)
        w1d, w2d = world_points(R, t, s, p["log_dscale"], f=f)
        w1, w2 = world_points(R, t, s, jnp.zeros_like(p["log_dscale"]))
        if anchor3d_mode == "depth":
            w1, w2 = w1d, w2d
        # project the OTHER side's 3D point into this image vs the matched
        # pixel (sparse_ga.py:377-392), both directions
        u1 = reproj(R[ai], t[ai], s[ai], f[ai], pp[ai], w2d)
        u2 = reproj(R[aj], t[aj], s[aj], f[aj], pp[aj], w1d)
        d1 = jnp.sqrt(jnp.sum((u1 - x1) ** 2, -1) + 1e-12)
        d2 = jnp.sqrt(jnp.sum((u2 - x2) ** 2, -1) + 1e-12)
        l2d = jnp.sum((g2(d1) + g2(d2)) * w_strong) / (2 * n_strong)
        # 3D coincidence anchor: with free per-image poses (no kinematic
        # chain / depth reparameterization, see module docstring) the
        # reprojection objective alone leaves depth-direction translation
        # and per-image scale nearly unconstrained (u = f*x/z is invariant
        # to scaling the camera-frame point), so the metric structure is
        # pinned by keeping the coarse 3D term active — the role the
        # reference's chain + core_depth parameterization plays
        # (sparse_ga.py:254-283)
        d3 = jnp.sqrt(jnp.sum((w1 - w2) ** 2, -1) + 1e-12) / scene_norm
        l3d = jnp.sum(g1(d3) * w_strong) / n_strong
        if anchor3d_mode == "off":
            l3d = 0.0
        # depth-scale prior toward the predictions: without it the
        # per-anchor freedom absorbs pose error (measured: translation
        # error 0.07 -> 0.35 on the exact-pointmap synthetic scene)
        dsc = p["log_dscale"]
        reg = jnp.mean(dsc[slot_j] ** 2 + strong_f * dsc[slot_i] ** 2)
        return (l2d + anchor3d_w * l3d
                + loss_dust3r_w * loss_weak(w1, w2)
                + depth_reg_w * reg)

    def make_run(loss_fn, fine: bool):
        @functools.partial(jax.jit, static_argnames=("niter", "lr"))
        def run(p, niter: int, lr: float):
            m = jax.tree.map(jnp.zeros_like, p)
            vv = jax.tree.map(jnp.zeros_like, p)

            def step(it, carry):
                p, m, vv = carry
                tt = it.astype(jnp.float32)
                cur = lr_min + (lr - lr_min) * (
                    1 + jnp.cos(jnp.pi * tt / niter)) / 2
                _, grads = jax.value_and_grad(loss_fn)(p)
                if not fine:  # coarse phase: poses only (sparse_ga.py:432-439)
                    grads = dict(grads, log_focal=jnp.zeros_like(
                        grads["log_focal"]), pp=jnp.zeros_like(grads["pp"]))
                if not fine or not opt_depth:
                    # core_depth trains only in the fine phase
                    # (sparse_ga.py:440-453)
                    grads = dict(grads, log_dscale=jnp.zeros_like(
                        grads["log_dscale"]))
                bc1 = 1 - 0.9 ** (tt + 1)
                # Adam normalizes gradient magnitude, so the gentler depth
                # step must scale the UPDATE (per-leaf lr factor), keeping
                # pose corrections ahead of depth absorption
                lr_fac = dict(pose=1.0, log_focal=1.0, pp=1.0,
                              log_dscale=depth_lr_scale)

                def upd(p_, g, m_, v_, fac):
                    m_ = 0.9 * m_ + 0.1 * g
                    v_ = 0.9 * v_ + 0.1 * g * g
                    return (p_ - fac * cur * (m_ / bc1)
                            / (jnp.sqrt(v_ / bc1) + 1e-8), m_, v_)

                out = jax.tree.map(upd, p, grads, m, vv, lr_fac)
                unzip = lambda k: jax.tree.map(  # noqa: E731
                    lambda o: o[k], out,
                    is_leaf=lambda x: isinstance(x, tuple))
                return unzip(0), unzip(1), unzip(2)

            p, m, vv = jax.lax.fori_loop(0, niter, step, (p, m, vv))
            return p, loss_fn(p)

        return run

    final = np.nan
    if niter1:
        params, final = make_run(loss_coarse, fine=False)(
            params, niter1, lr1)
    if niter2:
        params, final = make_run(loss_fine, fine=True)(
            params, niter2, lr2)

    # one jitted decode dispatch resolves the (possibly chained) absolute
    # poses; everything after is numpy (axon eager-op rule, CLAUDE.md)
    R_abs, t_abs, s_abs, f_abs, _ = jax.jit(decode)(params)
    R_np = np.asarray(R_abs, np.float64)
    t_np = np.asarray(t_abs, np.float64)
    scales = np.asarray(s_abs, np.float64)
    focals_out = np.asarray(f_abs, np.float64)
    c2w = np.tile(np.eye(4), (v, 1, 1))
    c2w[:, :3, :3] = R_np
    c2w[:, :3, 3] = t_np
    c2w[0] = np.eye(4)  # gauge anchor
    dsc_out = None
    if opt_depth and niter2:
        dsc_out = np.asarray(params["log_dscale"], np.float64).reshape(
            v, n_cells // wa, wa)
    return SparseGAResult(c2w, scales, focals_out, float(final), dsc_out)
