"""Eval stack: pose metrics (sim3 invariance, ATE/RPE) + LPIPS plumbing."""

import numpy as np
import pytest

from instantsplat_tpu.eval import image_metrics, pose_metrics


def _traj(n=8, seed=0):
    rng = np.random.default_rng(seed)
    mats = []
    for k in range(n):
        ang = 0.2 * k
        R = np.array([
            [np.cos(ang), -np.sin(ang), 0],
            [np.sin(ang), np.cos(ang), 0],
            [0, 0, 1],
        ])
        m = np.eye(4)
        m[:3, :3] = R
        m[:3, 3] = [np.sin(ang) * 3, np.cos(ang) * 2, 0.1 * k]
        mats.append(m)
    return np.stack(mats)


def test_pose_eval_sim3_invariant():
    gt = _traj()
    # estimate = gt under an arbitrary global sim3 -> all metrics ~ 0
    s = 2.7
    th = 0.8
    R = np.array([
        [1, 0, 0],
        [0, np.cos(th), -np.sin(th)],
        [0, np.sin(th), np.cos(th)],
    ])
    t = np.array([5.0, -2.0, 1.0])
    est = gt.copy()
    est[:, :3, :3] = R[None] @ gt[:, :3, :3]
    est[:, :3, 3] = (s * (R @ gt[:, :3, 3:4]))[..., 0] + t
    res = pose_metrics.evaluate_pose(est, gt)
    assert res["ATE"] < 1e-9
    assert res["RPE_t"] < 1e-7
    assert res["RPE_r"] < 1e-7


def test_pose_eval_detects_error():
    gt = _traj()
    rng = np.random.default_rng(1)
    est = gt.copy()
    est[:, :3, 3] += rng.standard_normal((len(gt), 3)) * 0.1
    res = pose_metrics.evaluate_pose(est, gt)
    assert res["ATE"] > 1e-3
    assert res["RPE_t"] > 1e-3


def test_umeyama_recovers_transform():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((30, 3))
    th = 0.5
    R = np.array([
        [np.cos(th), 0, np.sin(th)],
        [0, 1, 0],
        [-np.sin(th), 0, np.cos(th)],
    ])
    s, t = 1.9, np.array([1.0, 2.0, 3.0])
    y = s * x @ R.T + t
    s2, R2, t2 = pose_metrics.umeyama(y, x)
    assert abs(s2 - s) < 1e-9
    np.testing.assert_allclose(R2, R, atol=1e-9)
    np.testing.assert_allclose(t2, t, atol=1e-9)


def test_rpe_identity():
    gt = _traj()
    t_err, r_err = pose_metrics.compute_rpe(gt, gt)
    assert t_err < 1e-12 and r_err < 1e-6


def test_lpips_architecture():
    params = image_metrics.LpipsVGG.random(0)
    rng = np.random.default_rng(3)
    x = rng.random((32, 48, 3)).astype(np.float32)
    y = rng.random((32, 48, 3)).astype(np.float32)
    d_xy = float(image_metrics.lpips_pair(params, x, y))
    d_yx = float(image_metrics.lpips_pair(params, y, x))
    d_xx = float(image_metrics.lpips_pair(params, x, x))
    assert d_xy > 0 and abs(d_xy - d_yx) < 1e-5
    assert abs(d_xx) < 1e-6
    # distance grows with perturbation magnitude
    d_small = float(image_metrics.lpips_pair(
        params, x, np.clip(x + 0.02, 0, 1)))
    d_big = float(image_metrics.lpips_pair(
        params, x, np.clip(x + 0.3, 0, 1)))
    assert d_small < d_big


def test_lpips_unavailable_raises():
    image_metrics.set_default_lpips(None)
    with pytest.raises(RuntimeError, match="LPIPS weights unavailable"):
        image_metrics.lpips(np.zeros((8, 8, 3)), np.zeros((8, 8, 3)))


def test_lpips_torch_weight_conversion(tmp_path):
    """LpipsVGG.from_torch_files consumes torchvision-style vgg16 features
    + richzhang lin weights saved with torch."""
    import torch

    rng = np.random.default_rng(0)
    feat_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    plan = [(64, 3), (64, 64), (128, 64), (128, 128), (256, 128),
            (256, 256), (256, 256), (512, 256), (512, 512), (512, 512),
            (512, 512), (512, 512), (512, 512)]
    vgg_sd = {}
    for li, (cout, cin) in zip(feat_idx, plan):
        vgg_sd[f"features.{li}.weight"] = torch.from_numpy(
            rng.standard_normal((cout, cin, 3, 3)).astype(np.float32) * 0.01)
        vgg_sd[f"features.{li}.bias"] = torch.zeros(cout)
    lin_sd = {}
    for i, c in enumerate([64, 128, 256, 512, 512]):
        lin_sd[f"lin{i}.model.1.weight"] = torch.from_numpy(
            rng.random((1, c, 1, 1)).astype(np.float32))
    torch.save(vgg_sd, tmp_path / "vgg16.pth")
    torch.save(lin_sd, tmp_path / "lin.pth")

    params = image_metrics.LpipsVGG.from_torch_files(
        tmp_path / "vgg16.pth", tmp_path / "lin.pth")
    x = rng.random((32, 32, 3)).astype(np.float32)
    y = rng.random((32, 32, 3)).astype(np.float32)
    d = float(image_metrics.lpips_pair(params, x, y))
    assert np.isfinite(d) and d >= 0
    assert float(image_metrics.lpips_pair(params, x, x)) < 1e-8
