"""RANSAC-PnP pose completion (reference init_im_poses.py:259-299).

Unit tests for the pure-numpy solver plus the aligner-level scenario the
robust path exists for: outlier-corrupted pointmaps that poison the dense
conf-weighted sim3 registration but leave RANSAC-PnP unharmed.
"""

import numpy as np
import pytest

from instantsplat_tpu.init import geometry as G
from instantsplat_tpu.init.aligner import GlobalAligner, PairPrediction
from instantsplat_tpu.init.pairs import make_pair_indices
from instantsplat_tpu.init.pnp import _rodrigues, fast_pnp, pnp_ransac


def _make_view(f=80.0, h=48, w=64, seed=0):
    rng = np.random.default_rng(seed)
    R = _rodrigues(np.array([0.2, -0.3, 0.1]))
    t = np.array([0.3, -0.1, 0.5])
    gx, gy = np.meshgrid(np.arange(w, dtype=np.float64),
                         np.arange(h, dtype=np.float64))
    z = 2.0 + rng.random((h, w))
    xc = (gx - w / 2) / f * z
    yc = (gy - h / 2) / f * z
    Xc = np.stack([xc, yc, z], -1)
    Xw = (Xc - t) @ R  # world pointmap consistent with the pixel grid
    return R, t, f, Xw.astype(np.float32)


def test_fast_pnp_exact():
    R, t, f, Xw = _make_view()
    h, w = Xw.shape[:2]
    res = fast_pnp(Xw, f, np.ones((h, w), bool))
    assert res is not None
    _, c2w = res
    w2c = np.linalg.inv(c2w)
    np.testing.assert_allclose(w2c[:3, :3], R, atol=1e-5)
    np.testing.assert_allclose(w2c[:3, 3], t, atol=1e-4)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fast_pnp_rejects_gross_outliers(seed):
    """35% gross outliers: PnP recovers the pose; the dense conf-weighted
    sim3 registration (the non-robust substitute) is dragged far off."""
    R, t, f, Xw = _make_view()
    h, w = Xw.shape[:2]
    rng = np.random.default_rng(100 + seed)
    flat = Xw.reshape(-1, 3).copy()
    bad = rng.choice(flat.shape[0], int(0.35 * flat.shape[0]), replace=False)
    flat[bad] += rng.normal(0, 5.0, (len(bad), 3)).astype(np.float32)
    Xw_bad = flat.reshape(h, w, 3)

    res = fast_pnp(Xw_bad, f, np.ones((h, w), bool), seed=seed)
    assert res is not None
    w2c = np.linalg.inv(res[1])
    # float32 maps + borderline outliers under the 5px gate: ~0.1 deg
    assert np.abs(w2c[:3, :3] - R).max() < 5e-3
    assert np.abs(w2c[:3, 3] - t).max() < 2e-2

    # contrast: dense (non-robust) registration of the clean camera-frame
    # map onto the corrupted world map — conf weights can't save it
    Xc = Xw @ R.T + t  # clean camera-frame points
    s, Rr, Tr = G.rigid_points_registration(
        Xc.reshape(-1, 3), Xw_bad.reshape(-1, 3),
        conf=np.ones(h * w, np.float32))
    # dense registration's c2w rotation is far from the true one
    assert np.abs(Rr - R.T).max() > 0.05


def test_pnp_ransac_too_few_points():
    K = np.eye(3) * 50.0
    K[2, 2] = 1.0
    assert pnp_ransac(np.zeros((4, 3)), np.zeros((4, 2)), K) is None


def _arc_scene(n_views=3, h=24, w=32, focal=40.0, seed=0):
    rng = np.random.default_rng(seed)
    c2w = []
    for v in range(n_views):
        ang = 0.12 * (v - (n_views - 1) / 2)
        c, s = np.cos(ang), np.sin(ang)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        center = np.array([2.0 * np.sin(ang), 0.0, -2.0 * (1 - np.cos(ang))])
        m = np.eye(4)
        m[:3, :3] = R
        m[:3, 3] = center
        c2w.append(m)
    c2w = np.stack(c2w)
    gx, gy = np.meshgrid(np.arange(w), np.arange(h))
    dirs_cam = np.stack(
        [(gx - w / 2) / focal, (gy - h / 2) / focal, np.ones_like(gx)], -1)
    pts_world, pts_cam = [], []
    for v in range(n_views):
        Rv, tv = c2w[v, :3, :3], c2w[v, :3, 3]
        d_world = dirs_cam @ Rv.T
        lam = (3.0 - tv[2]) / d_world[..., 2]
        pw = tv + lam[..., None] * d_world
        pts_world.append(pw)
        pts_cam.append((pw - tv) @ Rv)
    pts_world, pts_cam = np.stack(pts_world), np.stack(pts_cam)
    edges = make_pair_indices(n_views, "complete", symmetrize=True)
    pred_i = np.stack([pts_cam[i] for i, j in edges]).astype(np.float32)
    pred_j = np.stack([
        (pts_world[j] - c2w[i, :3, 3]) @ c2w[i, :3, :3] for i, j in edges
    ]).astype(np.float32)
    conf = 1.0 + np.exp(rng.random((len(edges), h, w)).astype(np.float32) * 2)
    return c2w, focal, edges, pred_i, pred_j, conf


def _pose_angle_err(c2w_est, c2w_gt, ref=0):
    """Rotation error (rad) of the relative pose (ref -> target)."""
    Ra = c2w_gt[ref][:3, :3].T @ c2w_gt[-1][:3, :3]
    Rb = c2w_est[ref][:3, :3].T @ c2w_est[-1][:3, :3]
    cos = (np.trace(Ra.T @ Rb) - 1) / 2
    return np.arccos(np.clip(cos, -1, 1))


def test_aligner_pnp_completion_survives_corrupted_pointmaps(monkeypatch):
    """High-confidence outliers in the maps that build a leaf image's fused
    cloud: PnP completion recovers its pose; forcing the dense fallback
    (fast_pnp -> None) yields a much worse pose — the exact failure mode
    the reference's robust path exists for."""
    c2w, focal, edges, pred_i, pred_j, conf = _arc_scene()
    rng = np.random.default_rng(5)
    h, w = pred_i.shape[1:3]
    leaf = 2
    for e, (i, j) in enumerate(edges):
        if j == leaf:  # corrupt the maps that fuse the leaf's world cloud
            flat = pred_j[e].reshape(-1, 3)
            bad = rng.choice(flat.shape[0], int(0.3 * flat.shape[0]),
                             replace=False)
            flat[bad] += rng.normal(0, 3.0, (len(bad), 3)).astype(np.float32)
            conf[e][...] = 5.0  # outliers carry HIGH confidence

    preds = PairPrediction(edges=edges, pred_i=pred_i, pred_j=pred_j,
                           conf_i=conf, conf_j=conf)
    al = GlobalAligner(preds)
    al.init_mst(known_focal=focal)
    err_pnp = _pose_angle_err(al.get_im_poses(), c2w)

    import instantsplat_tpu.init.pnp as pnp_mod

    monkeypatch.setattr(pnp_mod, "fast_pnp", lambda *a, **k: None)
    al2 = GlobalAligner(preds)
    al2.init_mst(known_focal=focal)
    err_dense = _pose_angle_err(al2.get_im_poses(), c2w)

    assert err_pnp < np.deg2rad(2.0), np.rad2deg(err_pnp)
    assert err_dense > 2 * err_pnp, (np.rad2deg(err_pnp),
                                     np.rad2deg(err_dense))
