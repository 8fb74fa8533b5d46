"""Global aligner: sim3 registration, focal estimation, MST init + Adam
loop on a synthetic scene with known geometry."""

import numpy as np
import pytest

from instantsplat_tpu.init import GlobalAligner, PairPrediction, geometry as G
from instantsplat_tpu.init.pairs import make_pair_indices


def _rot(axis, angle):
    axis = np.asarray(axis, float)
    axis /= np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K


def test_rigid_points_registration():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((100, 3))
    R = _rot([1, 2, 3], 0.7)
    s, t = 1.7, np.array([0.3, -1.2, 2.0])
    y = s * x @ R.T + t
    w = rng.random(100) + 0.5
    s2, R2, t2 = G.rigid_points_registration(x, y, conf=w)
    assert abs(s2 - s) < 1e-9
    np.testing.assert_allclose(R2, R, atol=1e-9)
    np.testing.assert_allclose(t2, t, atol=1e-9)


def test_estimate_focal_weiszfeld():
    h, w, f = 48, 64, 55.0
    gx, gy = np.meshgrid(np.arange(w), np.arange(h))
    z = 2.0 + 0.1 * np.sin(gx / 7.0) + 0.05 * np.cos(gy / 5.0)
    x = (gx - w / 2) / f * z
    y = (gy - h / 2) / f * z
    pts = np.stack([x, y, z], -1)
    est = G.estimate_focal_weiszfeld(pts)
    assert abs(est - f) / f < 1e-3


def _synthetic_scene(n_views=4, h=24, w=32, focal=40.0, seed=0):
    """Cameras on an arc looking at a bumpy plane; exact pairwise pointmaps."""
    rng = np.random.default_rng(seed)
    c2w = []
    for v in range(n_views):
        ang = 0.12 * (v - (n_views - 1) / 2)
        R = _rot([0, 1, 0], ang)
        center = np.array([2.0 * np.sin(ang), 0.0, -2.0 * (1 - np.cos(ang))])
        m = np.eye(4)
        m[:3, :3] = R
        m[:3, 3] = center
        c2w.append(m)
    c2w = np.stack(c2w)

    # per-view depth maps of a common surface: generate each view's rays and
    # intersect with plane z=3 (world) + bumps via iterative projection.
    gx, gy = np.meshgrid(np.arange(w), np.arange(h))
    dirs_cam = np.stack(
        [(gx - w / 2) / focal, (gy - h / 2) / focal, np.ones_like(gx)], -1)
    pts_world, pts_cam = [], []
    for v in range(n_views):
        Rv, tv = c2w[v, :3, :3], c2w[v, :3, 3]
        d_world = dirs_cam @ Rv.T
        # intersect ray with plane z = 3
        lam = (3.0 - tv[2]) / d_world[..., 2]
        pw = tv + lam[..., None] * d_world
        pts_world.append(pw)
        pts_cam.append((pw - tv) @ Rv)
    pts_world = np.stack(pts_world)
    pts_cam = np.stack(pts_cam)

    edges = make_pair_indices(n_views, "complete", symmetrize=True)
    pred_i = np.stack([pts_cam[i] for i, j in edges]).astype(np.float32)
    # pred_j: j's surface points expressed in i's camera frame
    pred_j = np.stack([
        (pts_world[j] - c2w[i, :3, 3]) @ c2w[i, :3, :3]
        for i, j in edges
    ]).astype(np.float32)
    conf = 1.0 + np.exp(rng.random((len(edges), h, w)).astype(np.float32))
    return c2w, focal, PairPrediction(
        edges=edges, pred_i=pred_i, pred_j=pred_j,
        conf_i=conf, conf_j=conf * 1.1)


def _relative_pose_error(c2w_a, c2w_b):
    """Max rotation angle (rad) + normalized translation error between all
    relative poses (gauge-invariant up to sim3)."""
    n = len(c2w_a)
    rot_err, t_err = 0.0, 0.0
    # normalize scale by mean camera-center spread
    ca = np.stack([m[:3, 3] for m in c2w_a])
    cb = np.stack([m[:3, 3] for m in c2w_b])
    sa = np.linalg.norm(ca - ca.mean(0), axis=1).mean() + 1e-12
    sb = np.linalg.norm(cb - cb.mean(0), axis=1).mean() + 1e-12
    for i in range(n):
        for j in range(i + 1, n):
            Ra = c2w_a[i][:3, :3].T @ c2w_a[j][:3, :3]
            Rb = c2w_b[i][:3, :3].T @ c2w_b[j][:3, :3]
            cos = (np.trace(Ra.T @ Rb) - 1) / 2
            rot_err = max(rot_err, np.arccos(np.clip(cos, -1, 1)))
            ta = c2w_a[i][:3, :3].T @ (ca[j] - ca[i]) / sa
            tb = c2w_b[i][:3, :3].T @ (cb[j] - cb[i]) / sb
            t_err = max(t_err, np.linalg.norm(ta - tb))
    return rot_err, t_err


@pytest.mark.slow
def test_mst_init_and_alignment_recover_poses():
    c2w_gt, focal_gt, preds = _synthetic_scene()
    al = GlobalAligner(preds)
    al.init_mst(focal_avg=True)

    # MST init alone should already be close (exact synthetic pointmaps)
    rot0, t0 = _relative_pose_error(al.get_im_poses(), c2w_gt)
    assert rot0 < 0.05, rot0
    f0 = al.get_focals()
    assert abs(f0[0] - focal_gt) / focal_gt < 0.05

    loss = al.align(niter=300)
    assert np.isfinite(loss)
    # Adam wanders around the (already exact) init at lr=0.01 before the
    # cosine decay settles; a couple degrees of residual jitter is the
    # expected optimizer behavior, not an alignment failure.
    rot1, t1 = _relative_pose_error(al.get_im_poses(), c2w_gt)
    assert rot1 < 0.05, (rot0, rot1)
    assert t1 < 0.1, (t0, t1)

    # fused pointmaps should agree across views where surfaces overlap:
    # compare view 0 and view 1 world points at corresponding surface pts
    pts = al.get_pts3d()
    # both views see the same plane; after gauge alignment the plane should
    # be planar: check planarity of view-0 points (fit plane, residual)
    p = pts[0].reshape(-1, 3)
    centered = p - p.mean(0)
    _, sv, _ = np.linalg.svd(centered, full_matrices=False)
    assert sv[2] / sv[0] < 0.02  # near-planar


def test_pair_indices():
    pairs = make_pair_indices(4, "complete", symmetrize=True)
    assert len(pairs) == 12
    assert set(pairs) == {(i, j) for i in range(4) for j in range(4) if i != j}
    pairs = make_pair_indices(5, "oneref-2", symmetrize=False)
    assert pairs == [(2, 0), (2, 1), (2, 3), (2, 4)]


def test_sparse_global_alignment():
    """Descriptor-match-based alignment recovers relative poses on a
    synthetic scene whose descriptors encode world position."""
    from instantsplat_tpu.init.sparse_align import sparse_global_alignment

    c2w_gt, focal, preds = _synthetic_scene(n_views=3)

    # descriptors as smooth unit-normalized functions of the WORLD point:
    # corresponding pixels across views share descriptors
    def desc_of(pts_in_frame, c2w_i):
        world = pts_in_frame @ c2w_i[:3, :3].T + c2w_i[:3, 3]
        x, y = world[..., 0], world[..., 1]
        # injective over the visible patch (low frequency + linear terms):
        # aliased periodic features would create gross outlier matches
        f = np.stack([
            x, y, np.sin(0.5 * x), np.cos(0.4 * y),
            np.sin(0.3 * (x + y)), np.ones_like(x),
        ], -1)
        return (f / np.linalg.norm(f, axis=-1, keepdims=True)).astype(
            np.float32)

    preds.desc_i = np.stack([
        desc_of(preds.pred_i[e], c2w_gt[i])
        for e, (i, j) in enumerate(preds.edges)
    ])
    preds.desc_j = np.stack([
        desc_of(preds.pred_j[e], c2w_gt[i])
        for e, (i, j) in enumerate(preds.edges)
    ])

    c2w, scales, focals, loss, _ = sparse_global_alignment(
        preds, subsample=4, niter1=300, niter2=150)
    assert np.isfinite(loss)
    rot, t = _relative_pose_error(c2w, c2w_gt)
    assert rot < 0.05, rot
    assert t < 0.15, t
    np.testing.assert_allclose(scales, 1.0, atol=0.2)
    np.testing.assert_allclose(focals, focal, rtol=0.15)


def test_triangulate_matches():
    from instantsplat_tpu.init.depth_refine import triangulate_matches

    K = np.array([[50.0, 0, 16], [0, 50.0, 12], [0, 0, 1]])
    c2w1 = np.eye(4)
    c2w2 = np.eye(4)
    c2w2[:3, 3] = [0.5, 0, 0]
    pts = np.array([[0.2, 0.1, 3.0], [-0.3, 0.2, 4.0], [0.0, 0.0, 2.5]])

    def project(p, c2w):
        pc = (p - c2w[:3, 3]) @ c2w[:3, :3]
        return pc[:2] / pc[2] * 50.0 + [16, 12]

    xy1 = np.stack([project(p, c2w1) for p in pts])
    xy2 = np.stack([project(p, c2w2) for p in pts])
    tri, gap = triangulate_matches(xy1, xy2, K, K, c2w1, c2w2)
    np.testing.assert_allclose(tri, pts, atol=1e-9)
    assert gap.max() < 1e-9


def test_tsdf_refine_improves_noisy_depth():
    from instantsplat_tpu.init.depth_refine import tsdf_refine_depth

    h, w = 24, 32
    f = 40.0
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]])
    c2w = np.tile(np.eye(4), (3, 1, 1))
    c2w[1, :3, 3] = [0.15, 0, 0]
    c2w[2, :3, 3] = [-0.15, 0, 0]
    gx, gy = np.meshgrid(np.arange(w), np.arange(h))
    # plane z=3 in world; per-view GT depth via ray intersection
    gt = []
    for v in range(3):
        dirs = np.stack([(gx - w / 2) / f, (gy - h / 2) / f,
                         np.ones_like(gx)], -1) @ c2w[v, :3, :3].T
        lam = (3.0 - c2w[v, 2, 3]) / dirs[..., 2]
        gt.append(lam)
    gt = np.stack(gt).astype(np.float32)
    rng = np.random.default_rng(0)
    noisy = gt.copy()
    noisy[0] += rng.standard_normal(gt[0].shape).astype(np.float32) * 0.05
    refined = np.asarray(tsdf_refine_depth(
        noisy, np.tile(K, (3, 1, 1)), c2w, trunc=0.1, n_iter=2,
        nsamples=128))
    # interior pixels of the noisy view move toward GT
    sl = (0, slice(4, -4), slice(4, -4))
    err_before = np.abs(noisy[sl] - gt[sl]).mean()
    err_after = np.abs(refined[sl] - gt[sl]).mean()
    assert err_after < err_before * 0.7, (err_before, err_after)


def test_sparse_fine_phase_recovers_focal():
    """The 2D-reprojection fine phase (sparse_ga.py:377-392,444-449) fixes
    what the 3D-only loss cannot touch: the 3D point-coincidence objective
    has NO focal dependence, so a wrong focal init survives niter2=0 but is
    pulled toward truth once the reprojection term runs (VERDICT r1 item
    7's acceptance case)."""
    from instantsplat_tpu.init.sparse_align import sparse_global_alignment

    c2w_gt, focal, preds = _synthetic_scene(n_views=3)

    def desc_of(pts_in_frame, c2w_i):
        world = pts_in_frame @ c2w_i[:3, :3].T + c2w_i[:3, 3]
        x, y = world[..., 0], world[..., 1]
        f = np.stack([
            x, y, np.sin(0.5 * x), np.cos(0.4 * y),
            np.sin(0.3 * (x + y)), np.ones_like(x),
        ], -1)
        return (f / np.linalg.norm(f, axis=-1, keepdims=True)).astype(
            np.float32)

    preds.desc_i = np.stack([
        desc_of(preds.pred_i[e], c2w_gt[i])
        for e, (i, j) in enumerate(preds.edges)
    ])
    preds.desc_j = np.stack([
        desc_of(preds.pred_j[e], c2w_gt[i])
        for e, (i, j) in enumerate(preds.edges)
    ])

    bad_f = 0.6 * focal
    res0 = sparse_global_alignment(preds, subsample=4, niter1=300,
                                   niter2=0, focals=np.full(3, bad_f))
    res1 = sparse_global_alignment(preds, subsample=4, niter1=300,
                                   niter2=300, focals=np.full(3, bad_f))
    # coarse-only: focal untouched (3D loss has no focal gradient)
    np.testing.assert_allclose(res0.focals, bad_f, rtol=1e-6)
    # fine phase: reprojection pulls focal most of the way to truth
    err0 = abs(bad_f - focal) / focal
    err1 = np.abs(res1.focals - focal).max() / focal
    assert err1 < 0.5 * err0, (res1.focals, focal)


def test_select_pairs_of_crops_covers_matches():
    from instantsplat_tpu.init.sparse_align import select_pairs_of_crops

    rng = np.random.default_rng(0)
    # correspondences clustered in two blobs of a 96x128 image pair
    blob1 = rng.uniform([5, 5], [40, 40], (30, 2))
    blob2 = rng.uniform([80, 50], [120, 90], (30, 2))
    xy1 = np.concatenate([blob1, blob2])
    xy2 = xy1 + [4.0, 2.0]
    crops = select_pairs_of_crops((96, 128), (96, 128), xy1, xy2,
                                  maxdim=64, overlap=0.5)
    assert len(crops) >= 1
    covered = np.zeros(len(xy1), bool)
    for c1, c2 in crops:
        assert 0 <= c1[0] < c1[2] <= 128 and 0 <= c1[1] < c1[3] <= 96
        assert 0 <= c2[0] < c2[2] <= 128 and 0 <= c2[1] < c2[3] <= 96
        covered |= ((xy1[:, 0] >= c1[0]) & (xy1[:, 0] < c1[2])
                    & (xy1[:, 1] >= c1[1]) & (xy1[:, 1] < c1[3]))
    assert covered.mean() > 0.8, covered.mean()


def test_refine_matches_coarse_to_fine():
    """Crop re-inference densifies matches and keeps them geometrically
    consistent (same world point => same descriptor)."""
    from instantsplat_tpu.init.sparse_align import (
        refine_matches_coarse_to_fine,
    )

    h, w = 96, 128
    shift = np.array([6.0, 3.0])

    def world_of(xy):  # a smooth injective "world coordinate" per pixel
        return np.stack([xy[..., 0] * 0.1, xy[..., 1] * 0.1], -1)

    def desc_map(origin, shape, img_shift):
        gy, gx = np.mgrid[0:shape[0], 0:shape[1]].astype(np.float64)
        xy = np.stack([gx + origin[0], gy + origin[1]], -1) - img_shift
        wp = world_of(xy)
        f = np.stack([wp[..., 0], wp[..., 1],
                      np.sin(0.7 * wp[..., 0]), np.cos(0.5 * wp[..., 1]),
                      np.ones(shape)], -1)
        return (f / np.linalg.norm(f, axis=-1, keepdims=True)).astype(
            np.float32)

    img1 = np.zeros((h, w, 3))
    img2 = np.zeros((h, w, 3))
    # coarse matches on a sparse grid (img2 content shifted by `shift`)
    gy, gx = np.mgrid[8:h - 8:12, 8:w - 16:12]
    xy1 = np.stack([gx.ravel(), gy.ravel()], -1).astype(float)
    xy2 = xy1 + shift

    calls = []

    def infer_fn(c1, c2, _origins=[]):
        # descriptors encode the same world field in both crops
        i = len(calls)
        calls.append((c1.shape, c2.shape))
        return infer_fn.descs[i]

    # precompute per-crop descriptor maps by replaying crop selection
    from instantsplat_tpu.init.sparse_align import select_pairs_of_crops

    crops = select_pairs_of_crops((h, w), (h, w), xy1, xy2,
                                  maxdim=48, overlap=0.5)
    assert crops, "selection must produce crop pairs"
    infer_fn.descs = [
        (desc_map(c1[:2], (c1[3] - c1[1], c1[2] - c1[0]), np.zeros(2)),
         desc_map(c2[:2], (c2[3] - c2[1], c2[2] - c2[0]), shift))
        for c1, c2 in crops
    ]
    f1, f2 = refine_matches_coarse_to_fine(
        img1, img2, xy1, xy2, infer_fn, maxdim=48, overlap=0.5,
        subsample=2)
    assert len(f1) > len(xy1), (len(f1), len(xy1))
    # every refined match must satisfy the true correspondence (+- 1px from
    # descriptor grid quantization)
    np.testing.assert_allclose(f2 - f1, np.tile(shift, (len(f1), 1)),
                               atol=1.5)


def test_mst_topo_order():
    from instantsplat_tpu.init.sparse_align import mst_topo_order

    # 4 images; strong 0-1, 1-2, 2-3 chain + weak shortcut 0-3
    edges = [(0, 1), (1, 0), (1, 2), (2, 1), (2, 3), (3, 2), (0, 3)]
    strengths = [100, 100, 80, 80, 60, 60, 1]
    order, parent = mst_topo_order(4, edges, strengths)
    assert order[0] == 0 and parent[0] == -1
    assert list(parent) == [-1, 0, 1, 2]  # the strong chain, not 0-3
    # every non-root appears after its parent in the traversal
    pos = {int(k): n for n, k in enumerate(order)}
    for k in range(1, 4):
        assert pos[parent[k]] < pos[k]

    # isolated image chains to the root
    order2, parent2 = mst_topo_order(3, [(0, 1), (1, 0)], [5, 5])
    assert parent2[2] == 0 and set(map(int, order2)) == {0, 1, 2}


def test_sparse_alignment_free_poses_still_works():
    """kinematic_chain=False keeps the free per-image parameterization."""
    from instantsplat_tpu.init.sparse_align import sparse_global_alignment

    c2w_gt, focal, preds = _synthetic_scene(n_views=3)

    def desc_of(pts_in_frame, c2w_i):
        world = pts_in_frame @ c2w_i[:3, :3].T + c2w_i[:3, 3]
        x, y = world[..., 0], world[..., 1]
        f = np.stack([
            x, y, np.sin(0.5 * x), np.cos(0.4 * y),
            np.sin(0.3 * (x + y)), np.ones_like(x),
        ], -1)
        return (f / np.linalg.norm(f, axis=-1, keepdims=True)).astype(
            np.float32)

    preds.desc_i = np.stack([
        desc_of(preds.pred_i[e], c2w_gt[i])
        for e, (i, j) in enumerate(preds.edges)
    ])
    preds.desc_j = np.stack([
        desc_of(preds.pred_j[e], c2w_gt[i])
        for e, (i, j) in enumerate(preds.edges)
    ])

    res = sparse_global_alignment(preds, subsample=4, niter1=300,
                                  niter2=0, kinematic_chain=False)
    rot, t = _relative_pose_error(res.c2w, c2w_gt)
    assert rot < 0.05, rot
    assert t < 0.15, t


def test_sparse_depth_opt_recovers_noisy_depths():
    """Per-anchor depth optimization in the fine phase (sparse_ga.py:
    355-392 core_depth, trainable at sparse_ga.py:453): on a scene whose
    pointmaps carry consistent per-image per-pixel depth noise but whose
    matches are exact, the optimizer (a) converges to a tighter loss than
    with depths frozen, (b) recovers depth corrections correlated with the
    injected noise at the right magnitude, and (c) improves rotation."""
    from instantsplat_tpu.init.sparse_align import sparse_global_alignment

    n_views, h, w, focal, noise, ss = 3, 24, 32, 40.0, 0.05, 4
    c2w_gt, _, _ = _synthetic_scene(n_views=n_views, h=h, w=w, focal=focal)
    rng = np.random.default_rng(0)
    D = 1.0 + noise * rng.standard_normal((n_views, h, w))
    gx, gy = np.meshgrid(np.arange(w), np.arange(h))
    pts_cam_n, pts_world_n, pts_world_c = [], [], []
    for v in range(n_views):
        Rv, tv = c2w_gt[v, :3, :3], c2w_gt[v, :3, 3]
        dirs = np.stack([(gx - w / 2) / focal, (gy - h / 2) / focal,
                         np.ones_like(gx)], -1)
        d_world = dirs @ Rv.T
        lam = (3.0 - tv[2]) / d_world[..., 2]
        pw = tv + lam[..., None] * d_world
        pc = (pw - tv) @ Rv
        pts_world_c.append(pw)
        pcn = pc * D[v][..., None]          # ray-consistent depth noise
        pts_cam_n.append(pcn)
        pts_world_n.append(tv + pcn @ Rv.T)
    edges = make_pair_indices(n_views, "complete", symmetrize=True)
    pred_i = np.stack([pts_cam_n[i] for i, j in edges]).astype(np.float32)
    pred_j = np.stack([
        (pts_world_n[j] - c2w_gt[i, :3, 3]) @ c2w_gt[i, :3, :3]
        for i, j in edges]).astype(np.float32)
    conf = 1.0 + np.exp(rng.random((len(edges), h, w)).astype(np.float32))
    preds = PairPrediction(edges=edges, pred_i=pred_i, pred_j=pred_j,
                           conf_i=conf, conf_j=conf * 1.1)

    def desc_of(v):  # descriptors from the CLEAN geometry: exact matches
        wd = pts_world_c[v]
        x, y = wd[..., 0], wd[..., 1]
        f = np.stack([x, y, np.sin(0.5 * x), np.cos(0.4 * y),
                      np.sin(0.3 * (x + y)), np.ones_like(x)], -1)
        return (f / np.linalg.norm(f, axis=-1, keepdims=True)).astype(
            np.float32)

    preds.desc_i = np.stack([desc_of(i) for i, j in edges])
    preds.desc_j = np.stack([desc_of(j) for i, j in edges])

    res_off = sparse_global_alignment(preds, subsample=ss, niter1=300,
                                      niter2=300, opt_depth=False)
    res_on = sparse_global_alignment(preds, subsample=ss, niter1=300,
                                     niter2=300, opt_depth=True)
    assert res_off.depth_scales is None
    assert res_on.loss < res_off.loss  # tighter convergence
    rot_off, _ = _relative_pose_error(res_off.c2w, c2w_gt)
    rot_on, _ = _relative_pose_error(res_on.c2w, c2w_gt)
    assert rot_on < rot_off
    # recovered log depth scales track the injected -log noise
    tgt = -np.log(D[:, ss // 2::ss, ss // 2::ss])
    got = res_on.depth_scales[:, :tgt.shape[1], :tgt.shape[2]]
    corr = np.corrcoef(got.ravel(), tgt.ravel())[0, 1]
    assert corr > 0.35, corr
    assert 0.5 < got.std() / tgt.std() < 2.0


def test_mask_sky_zeroes_confidence():
    """GlobalAligner.mask_sky (reference base_opt.py:288-295) returns a
    copy with im_conf zeroed exactly where segment_sky fires; the source
    aligner is untouched."""
    from instantsplat_tpu.eval.viz import segment_sky

    _, _, preds = _synthetic_scene(n_views=3)
    al = GlobalAligner(preds)
    h, w = al.H, al.W
    rng = np.random.default_rng(1)
    imgs = rng.random((al.n_imgs, h, w, 3)).astype(np.float32) * 0.3
    imgs[:, : h // 3, :, :] = [0.2, 0.4, 0.9]  # blue sky band

    before = al.im_conf.copy()
    res = al.mask_sky(imgs)
    assert np.array_equal(al.im_conf, before)  # deepcopy semantics
    for i in range(al.n_imgs):
        sky = segment_sky(imgs[i])
        assert sky[: h // 3].all()
        assert (res.im_conf[i][sky] == 0).all()
        assert np.array_equal(res.im_conf[i][~sky], before[i][~sky])
