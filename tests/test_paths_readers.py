"""Camera paths (ellipse/spiral/stepfun) + Blender transforms reader."""

import json

import numpy as np

from instantsplat_tpu.data import scene as scene_io
from instantsplat_tpu.utils import camera_paths as cp
from instantsplat_tpu.utils.stepfun import sample_np, weighted_percentile


def _ring_c2w(n=8, r=3.0):
    out = []
    for k in range(n):
        a = 2 * np.pi * k / n
        R = np.array([[np.cos(a), 0, np.sin(a)],
                      [0, 1, 0],
                      [-np.sin(a), 0, np.cos(a)]])
        m = np.eye(4)
        m[:3, :3] = R
        m[:3, 3] = [r * np.sin(a), 0.1, r * np.cos(a)]
        out.append(m)
    return np.stack(out)


def test_interpolated_path_endpoints():
    poses = _ring_c2w(4)[:2]
    path = cp.generate_interpolated_path(poses, n_interp=10)
    assert path.shape == (10, 3, 4)
    # starts at the first keyframe position (smoothness relaxes slightly)
    assert np.linalg.norm(path[0][:, 3] - poses[0][:3, 3]) < 0.2


def test_ellipse_path_orbits_scene():
    p = cp.generate_ellipse_path(_ring_c2w(), n_frames=40)
    assert p.shape == (40, 4, 4)
    assert np.isfinite(p).all()
    # camera centers (c2w translation of inv(w2c)) stay near the ring scale
    centers = np.stack([np.linalg.inv(m)[:3, 3] for m in p])
    rad = np.linalg.norm(centers[:, [0, 2]], axis=1)
    assert 0.5 < rad.mean() < 6.0


def test_spiral_path_shape():
    p = cp.generate_spiral_path(
        _ring_c2w(), np.tile([1.0, 10.0], (8, 1)), n_frames=20)
    assert p.shape == (20, 4, 4) and np.isfinite(p).all()


def test_stepfun_sampling():
    t = np.linspace(0, 1, 11)
    s = sample_np(None, t, np.zeros(10), 7)
    assert np.all(np.diff(s) > 0) and s.min() >= 0 and s.max() <= 1
    # heavily weighted bin attracts samples
    w = np.full(10, -10.0)
    w[3] = 10.0
    s2 = sample_np(None, t, w, 20)
    assert ((s2 >= 0.3) & (s2 <= 0.4 + 1e-6)).mean() > 0.9
    assert abs(weighted_percentile(t, np.ones(10), 50) - 0.5) < 1e-6


def test_blender_reader(tmp_path):
    from PIL import Image

    (tmp_path / "train").mkdir()
    frames = []
    rng = np.random.default_rng(0)
    for i in range(3):
        a = 0.3 * i
        c2w = np.eye(4)
        c2w[:3, 3] = [np.sin(a), 0, np.cos(a)]
        frames.append({"file_path": f"train/r_{i}",
                       "transform_matrix": c2w.tolist()})
        Image.fromarray(
            (rng.random((32, 40, 4)) * 255).astype("uint8")).save(
                tmp_path / f"train/r_{i}.png")
    json.dump({"camera_angle_x": 0.7, "frames": frames},
              open(tmp_path / "transforms_train.json", "w"))
    info, test_cams, _ = scene_io.read_nerf_synthetic(
        tmp_path, num_random_pts=500)
    assert len(info.cameras) == 3
    assert info.points.shape == (500, 3)
    assert info.cameras[0].image.shape == (32, 40, 3)
    # axis flip: c2w identity-rotation frame -> w2c rotation diag(1,-1,-1)
    w2c0 = info.poses_w2c[0]
    np.testing.assert_allclose(
        w2c0[:3, :3], np.diag([1.0, -1.0, -1.0]), atol=1e-12)
    assert (tmp_path / "points3d.ply").exists()
