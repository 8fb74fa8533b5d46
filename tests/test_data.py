"""Data layer: COLMAP/PLY round trips, split logic, scene assembly."""

import numpy as np
import pytest

from instantsplat_tpu.data import colmap, covis, ply, scene
from instantsplat_tpu.models.gaussians import GaussianModel


def _rand_rot(rng):
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    return colmap.qvec_to_rotmat(q)


def test_qvec_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        R = _rand_rot(rng)
        q = colmap.rotmat_to_qvec(R)
        np.testing.assert_allclose(colmap.qvec_to_rotmat(q), R, atol=1e-10)


@pytest.mark.parametrize("fmt", ["text", "binary"])
def test_colmap_roundtrip(tmp_path, fmt):
    rng = np.random.default_rng(1)
    cams = {
        i: colmap.ColmapCamera(
            id=i, model="PINHOLE", width=640, height=480,
            params=np.array([500.0, 510.0, 320.0, 240.0]) + i,
        )
        for i in (1, 2)
    }
    ims = {
        i: colmap.ColmapImage(
            id=i,
            qvec=colmap.rotmat_to_qvec(_rand_rot(rng)),
            tvec=rng.standard_normal(3),
            camera_id=i,
            name=f"img_{i:04d}.jpg",
        )
        for i in (1, 2)
    }
    xyz = rng.standard_normal((17, 3))
    rgb = rng.integers(0, 256, (17, 3))

    rw = {"text": (colmap.write_cameras_text, colmap.read_cameras_text,
                   colmap.write_images_text, colmap.read_images_text,
                   colmap.write_points3d_text, colmap.read_points3d_text),
          "binary": (colmap.write_cameras_binary, colmap.read_cameras_binary,
                     colmap.write_images_binary, colmap.read_images_binary,
                     colmap.write_points3d_binary, colmap.read_points3d_binary)
          }[fmt]
    wc, rc, wi, ri, wp, rp = rw

    wc(cams, tmp_path / "cameras.x")
    cams2 = rc(tmp_path / "cameras.x")
    for i in cams:
        assert cams2[i].model == "PINHOLE"
        np.testing.assert_allclose(cams2[i].params, cams[i].params)
        assert (cams2[i].width, cams2[i].height) == (640, 480)

    wi(ims, tmp_path / "images.x")
    ims2 = ri(tmp_path / "images.x")
    for i in ims:
        np.testing.assert_allclose(ims2[i].qvec, ims[i].qvec, atol=1e-12)
        np.testing.assert_allclose(ims2[i].tvec, ims[i].tvec, atol=1e-12)
        assert ims2[i].name == ims[i].name

    wp(tmp_path / "points3D.x", xyz, rgb)
    xyz2, rgb2, err2 = rp(tmp_path / "points3D.x")
    np.testing.assert_allclose(xyz2, xyz, atol=1e-12)
    np.testing.assert_allclose(rgb2, rgb)


def test_point_cloud_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    xyz = rng.standard_normal((33, 3)).astype(np.float32)
    rgb = rng.integers(0, 256, (33, 3))
    ply.store_point_cloud(tmp_path / "p.ply", xyz, rgb)
    xyz2, col2 = ply.fetch_point_cloud(tmp_path / "p.ply")
    np.testing.assert_allclose(xyz2, xyz, atol=1e-6)
    np.testing.assert_allclose(col2 * 255.0, rgb, atol=0.5)


def test_gaussian_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    n, d = 25, 2
    params = GaussianModel(
        xyz=rng.standard_normal((n, 3)).astype(np.float32),
        features_dc=rng.standard_normal((n, 1, 3)).astype(np.float32),
        features_rest=rng.standard_normal((n, 8, 3)).astype(np.float32),
        scaling=rng.standard_normal((n, 3)).astype(np.float32),
        rotation=rng.standard_normal((n, 4)).astype(np.float32),
        opacity=rng.standard_normal((n, 1)).astype(np.float32),
        cam_poses=np.zeros((0, 7), np.float32),
        max_sh_degree=d,
    )
    ply.save_gaussian_ply(tmp_path / "g.ply", params)
    back = ply.load_gaussian_ply(tmp_path / "g.ply", max_sh_degree=d)
    for f in ["xyz", "features_dc", "features_rest", "scaling", "rotation",
              "opacity"]:
        np.testing.assert_allclose(
            getattr(back, f), getattr(params, f), atol=1e-6, err_msg=f)


def test_split_train_test_reference_semantics():
    files = [f"im{i}.jpg" for i in range(24)]
    train, test, train_idx, test_idx = scene.split_train_test(files, n_views=3)
    # test: 12 linspace indices over [1, 22]
    np.testing.assert_array_equal(
        test_idx, np.linspace(1, 22, num=12, dtype=int))
    assert len(train) == 3
    assert set(train_idx).isdisjoint(set(test_idx))
    # train indices are a linspace over the non-test pool
    pool = [i for i in range(24) if i not in test_idx]
    expect = [pool[i] for i in
              np.linspace(0, len(pool) - 1, num=3, dtype=int)]
    assert train_idx == expect


def test_scene_write_read_cycle(tmp_path):
    rng = np.random.default_rng(4)
    n_views, h, w = 3, 32, 48
    _, sparse0, sparse1 = scene.init_filestructure(tmp_path, n_views)

    w2c = []
    for _ in range(n_views):
        m = np.eye(4)
        m[:3, :3] = _rand_rot(rng)
        m[:3, 3] = rng.standard_normal(3)
        w2c.append(m)
    files = [f"frame_{i:03d}.png" for i in range(n_views)]
    scene.save_extrinsics(sparse0, w2c, files, ".png")
    scene.save_intrinsics(sparse0, [100.0] * n_views, (w * 2, h * 2), (h, w))

    imgs = rng.random((n_views, h, w, 3)).astype(np.float32)
    pts3d = rng.standard_normal((n_views, h, w, 3)).astype(np.float32)
    confs = rng.random((n_views, h, w)).astype(np.float32)
    keep = rng.random((n_views, h, w)) > 0.5
    n_saved = scene.save_points3d(
        sparse0, imgs, pts3d, confs, masks=keep, save_txt_path=tmp_path)
    assert n_saved == int(keep.sum())

    info = scene.read_scene(tmp_path, n_views, split="train",
                            load_images=False)
    assert len(info.cameras) == n_views
    # w2c round trip through qvec/COLMAP text
    np.testing.assert_allclose(info.poses_w2c, np.stack(w2c), atol=1e-9)
    # focal doubled with the resolution upscale (model 48px -> org 96px)
    assert abs(float(info.cameras[0].fx) - 200.0) < 1e-4
    assert info.points.shape[0] == n_saved
    assert (tmp_path / "pts_num.txt").exists()
    # sidecars
    assert (sparse0 / "confidence.npy").exists()
    assert (sparse0 / "confidence_dsp.npy").exists()


def test_covis_masks_basic():
    # two views at the same pose: every pixel of view 2 projects onto view 1
    # points with identical depths -> all redundant. A far-away view sees
    # nothing -> nothing redundant.
    h, w = 16, 16
    K = np.array([[20.0, 0, 8.0], [0, 20.0, 8.0], [0, 0, 1]])
    ident = np.eye(4)
    yy, xx = np.mgrid[0:h, 0:w]
    z = np.full((h, w), 2.0)
    pts_cam = np.stack(
        [(xx - 8.0) / 20.0 * z, (yy - 8.0) / 20.0 * z, z], -1)
    pointmaps = np.stack([pts_cam, pts_cam])
    depthmaps = np.stack([z, z + 1e-6])
    masks = covis.compute_co_vis_masks(
        np.array([0, 1]), depthmaps, pointmaps,
        np.stack([K, K]), np.stack([ident, ident]), (2, h, w),
        depth_threshold=0.1,
    )
    assert not masks[0].any()  # first (most confident) view keeps all
    assert masks[1].mean() > 0.9  # second view nearly fully redundant


def test_save_points3d_max_pts_downsample(tmp_path):
    """max_pts_num caps the fused cloud by confidence-weighted sampling
    (reference sfm_utils.py:279-296); the confidence sidecar follows the
    downsampled set and the ply holds exactly the cap."""
    from instantsplat_tpu.data import ply
    from instantsplat_tpu.data.scene import save_points3d

    rng = np.random.default_rng(0)
    v, h, w = 2, 8, 10
    imgs = rng.random((v, h, w, 3)).astype(np.float32)
    pts3d = rng.random((v, h, w, 3)).astype(np.float32)
    confs = rng.random((v, h, w)).astype(np.float32) + 1.0
    n = save_points3d(tmp_path, imgs, pts3d, confs, use_masks=False,
                      save_txt_path=tmp_path, max_pts_num=37)
    assert n == 37
    saved_pts, _ = ply.fetch_point_cloud(tmp_path / "points3D.ply")
    assert saved_pts.shape[0] == 37
    assert np.load(tmp_path / "confidence_dsp.npy").shape[0] == 37
    txt = (tmp_path / "pts_num.txt").read_text()
    assert f"Vanilla points num: {v * h * w}" in txt
