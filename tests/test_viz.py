"""3D viz layer (dust3r/viz.py + mast3r demo glb export equivalents)."""

import json
import struct

import numpy as np
import pytest

from instantsplat_tpu.eval.viz import (
    SceneViz,
    auto_cam_size,
    depthmap_to_pts3d,
    pts3d_to_mesh,
)


def _parse_glb(path):
    """Minimal structural GLB validation -> (gltf json, bin bytes)."""
    raw = open(path, "rb").read()
    magic, version, total = struct.unpack_from("<III", raw, 0)
    assert magic == 0x46546C67 and version == 2
    assert total == len(raw)
    jlen, jtype = struct.unpack_from("<II", raw, 12)
    assert jtype == 0x4E4F534A
    gltf = json.loads(raw[20:20 + jlen])
    blen, btype = struct.unpack_from("<II", raw, 20 + jlen)
    assert btype == 0x004E4942
    bin_chunk = raw[28 + jlen:28 + jlen + blen]
    assert gltf["buffers"][0]["byteLength"] == len(bin_chunk)
    return gltf, bin_chunk


def test_depthmap_to_pts3d_roundtrip():
    f = 50.0
    K = np.array([[f, 0, 16.0], [0, f, 12.0], [0, 0, 1]])
    depth = 2.0 + np.random.default_rng(0).random((24, 32))
    pts = depthmap_to_pts3d(depth, K)
    # reproject: u = f x / z + cx must recover the pixel grid
    u = f * pts[..., 0] / pts[..., 2] + 16.0
    v = f * pts[..., 1] / pts[..., 2] + 12.0
    gx, gy = np.meshgrid(np.arange(32), np.arange(24))
    np.testing.assert_allclose(u, gx, atol=1e-9)
    np.testing.assert_allclose(v, gy, atol=1e-9)
    np.testing.assert_allclose(pts[..., 2], depth)


def test_pts3d_to_mesh_faces_and_mask():
    img = np.random.default_rng(0).random((4, 5, 3))
    pts = np.random.default_rng(1).random((4, 5, 3))
    v, f, c = pts3d_to_mesh(img, pts)
    assert v.shape == (20, 3) and c.shape == (20, 3)
    assert len(f) == 2 * 3 * 4  # 2 triangles per quad
    valid = np.ones((4, 5), bool)
    valid[0, 0] = False  # kills the one triangle touching vertex 0
    _, f2, _ = pts3d_to_mesh(img, pts, valid=valid)
    assert len(f2) == len(f) - 1
    assert (f2 != 0).all()


def test_glb_export_structure(tmp_path):
    rng = np.random.default_rng(0)
    viz = SceneViz()
    viz.add_pointcloud(rng.random((100, 3)), rng.random((100, 3)))
    img = rng.random((4, 5, 3))
    pts = rng.random((4, 5, 3))
    viz.add_mesh(*pts3d_to_mesh(img, pts))
    viz.add_camera(np.eye(4), focal=50.0, imsize=(32, 24), cam_size=0.1)
    path = viz.export_glb(tmp_path / "scene.glb")

    gltf, bin_chunk = _parse_glb(path)
    assert len(gltf["meshes"]) == 3
    modes = [m["primitives"][0]["mode"] for m in gltf["meshes"]]
    assert modes == [0, 4, 1]  # points, triangles, lines
    # every accessor's view fits in the binary chunk
    for a in gltf["accessors"]:
        view = gltf["bufferViews"][a["bufferView"]]
        assert view["byteOffset"] + view["byteLength"] <= len(bin_chunk)
    # POSITION accessors carry required min/max
    for m in gltf["meshes"]:
        pa = gltf["accessors"][m["primitives"][0]["attributes"]["POSITION"]]
        assert "min" in pa and "max" in pa
    # triangle indices in range
    tri = gltf["meshes"][1]["primitives"][0]
    ia = gltf["accessors"][tri["indices"]]
    iv = gltf["bufferViews"][ia["bufferView"]]
    idx = np.frombuffer(
        bin_chunk[iv["byteOffset"]:iv["byteOffset"] + iv["byteLength"]],
        np.uint32)
    n_verts = gltf["accessors"][
        tri["attributes"]["POSITION"]]["count"]
    assert idx.max() < n_verts


def test_ply_export_roundtrip(tmp_path):
    from instantsplat_tpu.data.ply import _read_ply

    rng = np.random.default_rng(0)
    pts = rng.random((50, 3)).astype(np.float32)
    cols = rng.random((50, 3))
    viz = SceneViz().add_pointcloud(pts, cols)
    path = viz.export_ply(tmp_path / "pc.ply")
    d = _read_ply(path)
    np.testing.assert_allclose(
        np.stack([d["x"], d["y"], d["z"]], -1), pts, atol=1e-6)
    np.testing.assert_allclose(
        np.stack([d["red"], d["green"], d["blue"]], -1) / 255.0,
        cols, atol=1 / 255.0 + 1e-6)


def test_show_writes_png(tmp_path):
    rng = np.random.default_rng(0)
    viz = SceneViz()
    viz.add_pointcloud(rng.random((30, 3)), (1.0, 0.0, 0.0))
    viz.add_camera(np.eye(4), focal=40.0, imsize=(8, 6), cam_size=0.2)
    out = viz.show(tmp_path / "p.png")
    assert out.stat().st_size > 1000


def test_add_rgbd_masks_far_points():
    depth = np.full((6, 8), 2.0)
    depth[0, 0] = 100.0
    img = np.zeros((6, 8, 3))
    viz = SceneViz().add_rgbd(img, depth, zfar=10.0)
    assert len(viz._objs[0][1]) == 6 * 8 - 1


def test_auto_cam_size():
    poses = np.tile(np.eye(4), (3, 1, 1))
    poses[1, :3, 3] = [10, 0, 0]
    assert abs(auto_cam_size(poses) - 2.0) < 1e-9


def test_demo_cli_exports(tmp_path):
    """cli.demo on a pre-initialized synthetic scene writes the full demo
    artifact set (reference mast3r/demo.py:111-137 output role)."""
    from instantsplat_tpu.cli.demo import main as demo_main
    from instantsplat_tpu.data import scene as scene_io

    rng = np.random.default_rng(0)
    n_views, h, w = 3, 24, 32
    scene = tmp_path / "scene"
    sparse0 = scene / "sparse_3" / "0"
    sparse0.mkdir(parents=True)
    w2c = np.tile(np.eye(4), (n_views, 1, 1))
    w2c[:, 0, 3] = np.arange(n_views) * 0.2
    files = [f"f_{i:02d}.png" for i in range(n_views)]
    scene_io.save_extrinsics(sparse0, w2c, files, ".png")
    scene_io.save_intrinsics(sparse0, [40.0] * n_views, (w, h), (h, w))
    imgs = rng.random((n_views, h, w, 3)).astype(np.float32)
    pts = rng.random((n_views, h, w, 3)).astype(np.float32) + [0, 0, 2]
    confs = np.ones((n_views, h, w), np.float32)
    scene_io.save_points3d(sparse0, imgs, pts, confs, use_masks=False,
                           depth_threshold=0.0)

    out = demo_main(["-s", str(scene), "--n_views", "3"])
    for f in ("scene.glb", "scene.ply", "preview.png"):
        assert (out / f).exists(), f
    gltf, _ = _parse_glb(out / "scene.glb")
    # one pointcloud node + one frustum node per camera
    assert len(gltf["meshes"]) == 1 + n_views


def test_segment_sky_heuristic():
    """segment_sky reproduces the reference heuristic (dust3r/viz.py:
    345-389): RGB blue and luminous gray are sky, saturated red/green and
    dark pixels are not, small specks fall to the binary opening, and
    only components > half the largest survive."""
    from instantsplat_tpu.eval.viz import segment_sky

    h, w = 64, 96
    img = np.zeros((h, w, 3), np.float32)
    img[..., 1] = 0.3  # dull green ground (dark + saturated -> not sky)
    # big blue sky block (RGB blue; the reference's BGR quirk maps it to
    # hue ~0, inside its [0, 30] "blue" band)
    img[:24, :, :] = [0.2, 0.4, 0.9]
    # bright near-white cloud strip connected to nothing: second CC,
    # bigger than half the sky block? make it small so it's dropped
    img[40:46, 10:16, :] = [0.95, 0.95, 0.97]
    # 2x2 bright speck: must be erased by the 5x5 opening
    img[50:52, 60:62, :] = [0.2, 0.4, 0.9]

    mask = segment_sky(img)
    assert mask[:24, :].all()  # sky block fully masked
    assert not mask[30:, :].any()  # cloud strip + speck dropped, ground clear

    # saturated red is NOT sky even when bright (quirked hue ~120)
    img2 = np.zeros((h, w, 3), np.float32)
    img2[:24, :, :] = [0.9, 0.1, 0.1]
    assert not segment_sky(img2).any()

    # two comparable components both survive the >max/2 rule
    img3 = np.zeros((h, w, 3), np.float32)
    img3[:20, :40] = [0.2, 0.4, 0.9]
    img3[:20, 56:] = [0.2, 0.4, 0.9]
    m3 = segment_sky(img3)
    assert m3[:20, :40].all() and m3[:20, 56:].all()

    # uint8 input path
    assert segment_sky((img * 255).astype(np.uint8))[:24, :].all()
