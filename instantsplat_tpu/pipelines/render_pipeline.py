"""Stage 3/4: render train/test/interpolated views from a trained model.

Pipeline equivalent of the reference render.py (SURVEY.md §3.3):

- train branch: re-bind the optimized poses (pose_optimized.npy) onto the
  train cameras and render each (render.py:78-97, 205-216);
- test branch: per-view TEST-TIME POSE OPTIMIZATION — freeze all Gaussian
  parameters and refine each test camera's [7] pose against a masked L1
  (mask = rendering > 0) for 500 Adam iterations (lr_T=3e-3, lr_q=1e-3,
  betas (0.9, 0.999), weight_decay 1e-4, cosine anneal to 1e-4), keeping
  the best-loss pose (render.py:99-186). On TPU the whole per-view refine
  is ONE jitted lax.fori_loop — 500 iterations compile to a single XLA
  while-loop instead of 500 python steps;
- interp branch: spline-interpolated 10 s / 30 fps trajectory rendered to
  frames (render.py:36-76, 233-248); mp4 encoding is gated on imageio;
- FPS benchmark: 1000 renders, trimmed mean of the middle 800
  (render.py:172-186), appended to total_fps.json.
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from instantsplat_tpu.data import images as image_io, scene as scene_io
from instantsplat_tpu.models.camera import Camera
from instantsplat_tpu.ops.losses import masked_l1_loss
from instantsplat_tpu.pipelines.train_pipeline import load_trained
from instantsplat_tpu.render.driver import render
from instantsplat_tpu.utils import camera_paths
from instantsplat_tpu.utils import transforms as T


def _w2c_to_pose7(mats):
    return T.matrix_to_pose_np(mats)


def resolve_backend(params, camera, pose, bg, backend):
    """backend='auto' -> time one warm forward render per kernel and keep
    the faster (both are exact; the dense kernel wins when termination /
    the row bitmap bite, the binned one when they don't — see
    PERF_NOTES.md). Binned is only a candidate when its bins hold every
    splat. Non-'auto' values pass through."""
    if backend != "auto":
        return backend
    import time as _time

    import jax

    from instantsplat_tpu.pipelines.trainer import (
        _MAX_BINNED_CAP_FACTOR,
        _MAX_BINNED_D_LEVELS,
        _MAX_TILED_LEVEL_PRODUCT,
    )
    from instantsplat_tpu.render.driver import (
        binned_view_requirements,
        tiled_view_requirements,
    )

    candidates = ["pallas"]
    try:
        from instantsplat_tpu.ops.rasterize_pallas_tiled import (
            BLOCK_ROWS, COL_W, _round_up,
        )

        n = int(params.xyz.shape[0])
        n_tiles = ((_round_up(camera.height, BLOCK_ROWS) // BLOCK_ROWS)
                   * (_round_up(camera.width, COL_W) // COL_W))
        if n_tiles * (n + 1) < 2**31:
            cf, dy, dx = tiled_view_requirements(params, pose, camera)
            if (cf <= _MAX_BINNED_CAP_FACTOR
                    and dy * dx <= _MAX_TILED_LEVEL_PRODUCT):
                candidates.append(f"pallas-tiled:{cf}:{dy}:{dx}")
    except Exception as e:  # noqa: BLE001 — see trainer._binned_candidate
        logging.getLogger(__name__).warning(
            "backend auto: tiled sizing probe failed (%s: %s)",
            type(e).__name__, e)
    if len(candidates) == 1:
        # 2-D tiles out of range (giant splats) — try the 1-D binned bins
        try:
            cf, dl = binned_view_requirements(params, pose, camera)
            if cf <= _MAX_BINNED_CAP_FACTOR and dl <= _MAX_BINNED_D_LEVELS:
                candidates.append(f"pallas-binned:{cf}:{dl}")
        except Exception as e:  # noqa: BLE001
            logging.getLogger(__name__).warning(
                "backend auto: binned sizing probe failed (%s: %s); "
                "falling back to dense", type(e).__name__, e)
    timed = {}
    for cand in candidates:
        out = render(params, camera, pose=pose, bg=bg, backend=cand)
        jax.block_until_ready(out.render)  # compile + warm
        t0 = _time.perf_counter()
        out = render(params, camera, pose=pose, bg=bg, backend=cand)
        jax.block_until_ready(out.render)
        timed[cand] = _time.perf_counter() - t0
    pick = min(timed, key=timed.get)
    logging.getLogger(__name__).info(
        "backend auto: %s (%s per forward)", pick,
        ", ".join(f"{c}={timed[c] * 1e3:.1f} ms" for c in timed))
    return pick


def render_view_set(
    model_path, name, iteration, cameras, poses7, params,
    backend="pallas", white_background=False, save_gt=True,
):
    """Render views with given [V,7] poses; write renders/ (+ gt/)."""
    import jax.numpy as jnp

    out_dir = Path(model_path) / name / f"ours_{iteration}"
    (out_dir / "renders").mkdir(parents=True, exist_ok=True)
    if save_gt:
        (out_dir / "gt").mkdir(parents=True, exist_ok=True)
    bg = jnp.ones(3) if white_background else jnp.zeros(3)
    for idx, cam in enumerate(cameras):
        out = render(params, cam, pose=jnp.asarray(poses7[idx]), bg=bg,
                     backend=backend)
        image_io.save_image(
            out_dir / "renders" / f"{idx:05d}.png",
            np.clip(np.asarray(out.render), 0, 1))
        if save_gt and cam.image is not None:
            image_io.save_image(out_dir / "gt" / f"{idx:05d}.png",
                                np.asarray(cam.image))
    return out_dir


def make_pose_refiner(params, camera: Camera, backend="pallas",
                      num_iter=500, lr_t=3e-3, lr_q=1e-3, lr_min=1e-4,
                      weight_decay=1e-4, bg=None, block=50):
    """Jitted per-view test-time pose refinement (render.py:116-165).

    Returns fn(pose7, gt) -> (best_pose7, best_loss): 500 Adam steps on the
    (quat, trans) split with cosine-annealed LRs, masked-L1 objective, and
    an argmin-loss pose latch. The loop dispatches as bounded fori_loop
    blocks with a DYNAMIC trip count (one compile for every block size):
    identical math to a single fused loop, but one dispatch stays bounded
    — large scenes make 500 fused iterations arbitrarily slow, and the
    runtime may enforce an execution deadline (~60 s on the axon dev
    worker). The first view pays two tiny probe blocks to measure warm
    per-iteration time; the steady block size then targets
    INSTANTSPLAT_DISPATCH_BUDGET_S (default 20 s) wall per dispatch,
    capped at `block`.
    """
    import os
    import time as _time

    import jax
    import jax.numpy as jnp

    if bg is None:
        bg = jnp.zeros(3)
    beta1, beta2, eps = 0.9, 0.999, 1e-8
    budget = float(os.environ.get("INSTANTSPLAT_DISPATCH_BUDGET_S", 20.0))

    def loss_fn(pose, gt, intr):
        # intr [4] = (fx, fy, cx, cy): threaded per call so one compiled
        # refiner serves test sets whose same-resolution cameras carry
        # per-view focals (externally produced sparse dirs)
        cam = camera.replace(fx=intr[0], fy=intr[1], cx=intr[2], cy=intr[3])
        out = render(params, cam, pose=pose, bg=bg, backend=backend)
        mask = (out.render > 0.0).astype(jnp.float32)
        return masked_l1_loss(out.render, gt, mask)

    @jax.jit
    def refine_block(start, n, carry, gt, intr):
        def step(k, carry):
            pose, m, v, best_pose, best_loss = carry
            t = (start + k).astype(jnp.float32)
            cos = (1 + jnp.cos(jnp.pi * t / num_iter)) / 2
            cur_t = lr_min + (lr_t - lr_min) * cos
            cur_q = lr_min + (lr_q - lr_min) * cos
            lr_vec = jnp.concatenate(
                [jnp.full(4, cur_q), jnp.full(3, cur_t)])
            loss, g = jax.value_and_grad(loss_fn)(pose, gt, intr)
            g = g + weight_decay * pose  # AdamW-style decay (torch Adam
            # weight_decay adds wd*p to the gradient)
            m = beta1 * m + (1 - beta1) * g
            v = beta2 * v + (1 - beta2) * g * g
            tt = t + 1.0
            upd = lr_vec * (m / (1 - beta1**tt)) / (
                jnp.sqrt(v / (1 - beta2**tt)) + eps)
            better = loss < best_loss
            best_pose = jnp.where(better, pose, best_pose)
            best_loss = jnp.minimum(loss, best_loss)
            return pose - upd, m, v, best_pose, best_loss

        # dynamic trip count: any block size reuses the one compilation
        return jax.lax.fori_loop(0, n, step, carry)

    cal = {"block": None}  # calibrated once, shared across views

    def refine(pose0, gt, intr=None):
        if intr is None:
            intr = jnp.stack([camera.fx, camera.fy, camera.cx, camera.cy])
        carry = (pose0, jnp.zeros_like(pose0), jnp.zeros_like(pose0),
                 pose0, jnp.inf)
        done = 0
        if cal["block"] is None and budget > 0:
            probe = max(1, min(5, num_iter))
            per_iter = 0.0
            for i in range(2):  # first pays the compile; second is warm
                n = min(probe, num_iter - done)
                if n <= 0:
                    break
                t0 = _time.perf_counter()
                carry = refine_block(jnp.int32(done), jnp.int32(n), carry,
                                     gt, intr)
                jax.block_until_ready(carry[4])
                per_iter = (_time.perf_counter() - t0) / n
                done += n
            cal["block"] = int(max(1, min(
                block, budget / max(per_iter, 1e-9))))
        cur = cal["block"] or block
        while done < num_iter:
            n = min(cur, num_iter - done)
            carry = refine_block(jnp.int32(done), jnp.int32(n), carry, gt,
                                 intr)
            done += n
        return carry[3], carry[4]

    return refine


def refine_poses_sharded(params, camera, poses0, gts, mesh,
                         backend="pallas", num_iter=500, lr_t=3e-3,
                         lr_q=1e-3, lr_min=1e-4, weight_decay=1e-4,
                         bg=None, block=50, intrinsics=None):
    """Batched test-time pose refinement: ALL V independent per-view
    refinements (render.py:99-186) advance inside one dispatch per block
    (lax.map over views), cutting the host round-trips V-fold vs the
    per-view loop. With `mesh`, the view axis additionally shards over
    the chips (shard_map; no collectives until the final gather); with
    mesh=None the map runs on the one device. Identical per-view math to
    make_pose_refiner; dispatches in the same bounded blocks
    (execution-deadline rule, CLAUDE.md).

    poses0 [V, 7], gts [V, H, W, 3] -> (best_poses [V, 7], best_loss [V]).
    `intrinsics` [V, 4] = per-view (fx, fy, cx, cy); defaults to `camera`'s
    for every view (pipeline-written scenes share one camera record).
    """
    import functools
    import os
    import time as _time

    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    if bg is None:
        bg = jnp.zeros(3)
    axis = list(mesh.axis_names)[0] if mesh is not None else None
    ndev = mesh.shape[axis] if mesh is not None else 1
    v = poses0.shape[0]
    v_pad = ((v + ndev - 1) // ndev) * ndev
    poses0 = jnp.asarray(poses0, jnp.float32)
    gts = jnp.asarray(gts, jnp.float32)
    if intrinsics is None:
        one = jnp.stack([camera.fx, camera.fy, camera.cx, camera.cy])
        intrinsics = jnp.tile(one[None, :], (v, 1))
    intrinsics = jnp.asarray(intrinsics, jnp.float32)
    if v_pad > v:  # pad with copies of view 0 (discarded after)
        poses0 = jnp.concatenate(
            [poses0, jnp.tile(poses0[:1], (v_pad - v, 1))])
        gts = jnp.concatenate([gts, jnp.tile(gts[:1], (v_pad - v, 1, 1, 1))])
        intrinsics = jnp.concatenate(
            [intrinsics, jnp.tile(intrinsics[:1], (v_pad - v, 1))])
    beta1, beta2, eps = 0.9, 0.999, 1e-8
    budget = float(os.environ.get("INSTANTSPLAT_DISPATCH_BUDGET_S", 20.0))

    def loss_fn(pose, gt, intr):
        cam = camera.replace(fx=intr[0], fy=intr[1], cx=intr[2], cy=intr[3])
        out = render(params, cam, pose=pose, bg=bg, backend=backend)
        mask = (out.render > 0.0).astype(jnp.float32)
        return masked_l1_loss(out.render, gt, mask)

    def view_block(start, n, carry, gt, intr):
        def step(k, carry):
            pose, m, vv, best_pose, best_loss = carry
            t = (start + k).astype(jnp.float32)
            cos = (1 + jnp.cos(jnp.pi * t / num_iter)) / 2
            cur_t = lr_min + (lr_t - lr_min) * cos
            cur_q = lr_min + (lr_q - lr_min) * cos
            lr_vec = jnp.concatenate(
                [jnp.full(4, cur_q), jnp.full(3, cur_t)])
            loss, g = jax.value_and_grad(loss_fn)(pose, gt, intr)
            g = g + weight_decay * pose
            m = beta1 * m + (1 - beta1) * g
            vv = beta2 * vv + (1 - beta2) * g * g
            tt = t + 1.0
            upd = lr_vec * (m / (1 - beta1**tt)) / (
                jnp.sqrt(vv / (1 - beta2**tt)) + eps)
            better = loss < best_loss
            best_pose = jnp.where(better, pose, best_pose)
            best_loss = jnp.minimum(loss, best_loss)
            return pose - upd, m, vv, best_pose, best_loss

        return jax.lax.fori_loop(0, n, step, carry)

    @jax.jit
    def block_fn(start, n, carry, gts_b, intr_b):
        def run_local(carry_local, gt_local, intr_local):
            return jax.lax.map(
                lambda cgi: view_block(start, n, cgi[0], cgi[1], cgi[2]),
                (carry_local, gt_local, intr_local))

        if mesh is None:
            return run_local(carry, gts_b, intr_b)
        run = functools.partial(
            jax.shard_map, mesh=mesh, in_specs=(P(axis), P(axis), P(axis)),
            out_specs=P(axis), check_vma=False)(run_local)
        return run(carry, gts_b, intr_b)

    carry = (poses0, jnp.zeros_like(poses0), jnp.zeros_like(poses0),
             poses0, jnp.full((v_pad,), jnp.inf))
    done = 0
    cal_block = None
    if budget > 0:
        # one batched block = V/ndev view-iterations of work per scan
        # step, so probe at a SINGLE iteration — a 5-iteration probe of a
        # heavy scene can cross the runtime's ~60 s execution deadline
        # before any calibration exists
        probe = 1
        per_iter = 0.0
        for _ in range(2):  # first pays the compile; second is warm
            n = min(probe, num_iter - done)
            if n <= 0:
                break
            t0 = _time.perf_counter()
            carry = block_fn(jnp.int32(done), jnp.int32(n), carry, gts,
                             intrinsics)
            jax.block_until_ready(carry[4])
            per_iter = (_time.perf_counter() - t0) / n
            done += n
        cal_block = int(max(1, min(block, budget / max(per_iter, 1e-9))))
    cur = cal_block or block
    t_start = _time.perf_counter()
    last_report = 0
    while done < num_iter:
        n = min(cur, num_iter - done)
        carry = block_fn(jnp.int32(done), jnp.int32(n), carry, gts,
                         intrinsics)
        done += n
        if done - last_report >= 100 or done >= num_iter:
            jax.block_until_ready(carry[4])
            print(f"[render] pose refinement {done}/{num_iter} iterations "
                  f"x {v} views ({_time.perf_counter() - t_start:.0f}s)",
                  flush=True)
            last_report = done
    return np.asarray(carry[3][:v]), np.asarray(carry[4][:v])


def render_set_optimize(
    model_path, name, iteration, cameras, poses7, params,
    backend="pallas", white_background=False, num_iter=500,
    test_fps=False, mesh=None,
):
    """Test branch: refine each view's pose, then render (render.py:99-186).

    With `mesh`, the per-view refinements run views-data-parallel over the
    chips (refine_poses_sharded). Returns the refined [V,7] poses.
    """
    import jax
    import jax.numpy as jnp

    out_dir = Path(model_path) / name / f"ours_{iteration}"
    (out_dir / "renders").mkdir(parents=True, exist_ok=True)
    (out_dir / "gt").mkdir(parents=True, exist_ok=True)
    bg = jnp.ones(3) if white_background else jnp.zeros(3)

    same_shape = len({(c.height, c.width) for c in cameras}) == 1
    if same_shape and len(cameras) > 1 and num_iter > 0:
        # batched refinement (one dispatch advances every view's loop;
        # sharded over `mesh` when given) — the per-view path below
        # remains for mixed-shape test sets
        gts = jnp.stack([c.image for c in cameras])
        intr = jnp.stack([jnp.stack([c.fx, c.fy, c.cx, c.cy])
                          for c in cameras])
        refined_arr, _ = refine_poses_sharded(
            params, cameras[0], jnp.asarray(np.asarray(poses7)), gts, mesh,
            backend=backend, num_iter=num_iter, bg=bg, intrinsics=intr)
        refined = [np.asarray(p) for p in refined_arr]
    else:
        refined = []
        # one refiner per raster shape (static H/W compile to the render);
        # per-view intrinsics are threaded dynamically so same-shape views
        # share the compilation
        refiner_of_shape: dict = {}
        for idx, cam in enumerate(cameras):
            key = (cam.height, cam.width)
            if key not in refiner_of_shape:
                refiner_of_shape[key] = make_pose_refiner(
                    params, cam, backend=backend, num_iter=num_iter, bg=bg)
            best_pose, _ = refiner_of_shape[key](
                jnp.asarray(poses7[idx]), cam.image,
                intr=jnp.stack([cam.fx, cam.fy, cam.cx, cam.cy]))
            refined.append(np.asarray(best_pose))

    for idx, cam in enumerate(cameras):
        out = render(params, cam, pose=jnp.asarray(refined[idx]), bg=bg,
                     backend=backend)
        image_io.save_image(out_dir / "renders" / f"{idx:05d}.png",
                            np.clip(np.asarray(out.render), 0, 1))
        image_io.save_image(out_dir / "gt" / f"{idx:05d}.png",
                            np.asarray(cam.image))

    if test_fps:
        pose = jnp.asarray(refined[-1])
        cam = cameras[-1]
        fn = jax.jit(lambda p: render(params, cam, pose=p, bg=bg,
                                      backend=backend).render)
        jax.block_until_ready(fn(pose))
        times = []
        for _ in range(1000):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(pose))
            times.append(time.perf_counter() - t0)
        times.sort()
        fps = 1.0 / (sum(times[100:900]) / 800.0)
        with open(Path(model_path) / "total_fps.json", "a") as f:
            json.dump(f"{fps}", f, indent=True)
            f.write("\n")
        print(f">>> FPS = {fps:.1f}")
    return np.stack(refined)


def save_interpolated_poses(model_path, iteration, n_views, seconds=10,
                            fps=30):
    """render.py:36-57: spline path over the optimized poses -> npy (plus
    the pose visualizations the reference writes alongside)."""
    pdir = Path(model_path) / "pose" / f"ours_{iteration}"
    org = np.load(pdir / "pose_optimized.npy")
    inter = camera_paths.video_path_from_train_poses(
        org, n_views, seconds=seconds, fps=fps)
    np.save(pdir / "pose_interpolated.npy", inter)
    try:
        from instantsplat_tpu.eval.pose_viz import visualize_cameras

        visualize_cameras(org, ["green"] * len(org),
                          pdir / "poses_optimized.png")
        visualize_cameras(inter, ["blue"] * len(inter),
                          pdir / "poses_interpolated.png")
    except Exception as e:
        print(f"[render] pose viz skipped: {e}")
    return inter


def frames_to_video(frame_dir, out_path, fps=30):
    """mp4 from frames (render.py:60-76); degrades gracefully when no
    video encoder is available (e.g. imageio without the ffmpeg plugin):
    the frames remain on disk either way."""
    try:
        import imageio

        frames = [
            imageio.imread(p)
            for p in sorted(Path(frame_dir).glob("*.png"))
        ]
        imageio.mimwrite(out_path, frames, fps=fps)
        return True
    except Exception as e:
        print(f"[render] video encode unavailable ({e}); "
              f"frames left in {frame_dir}")
        return False


def run_render(
    model: "ModelParams",  # noqa: F821
    iteration=-1,
    skip_train=False,
    skip_test=False,
    infer_video=False,
    optim_test_pose_iter=500,
    test_fps=True,
    backend="pallas",
    video_seconds=10,
    mesh=None,
):
    """Full render_sets flow (render.py:189-248). With `mesh`, test-time
    pose refinement runs views-data-parallel over the chips."""
    model_path = Path(model.model_path)
    train_info = scene_io.read_scene(
        model.source_path, model.n_views, split="train",
        images_dir=model.images)
    params, iteration = load_trained(
        model_path, iteration, sh_degree=model.sh_degree)
    backend = resolve_backend(
        params, train_info.cameras[0],
        jnp.asarray(_w2c_to_pose7(train_info.poses_w2c[:1])[0]),
        jnp.ones(3) if model.white_background else jnp.zeros(3), backend)

    if not skip_train:
        opt_poses = np.load(
            model_path / "pose" / f"ours_{iteration}" / "pose_optimized.npy")
        render_view_set(
            model_path, "train", iteration, train_info.cameras,
            _w2c_to_pose7(opt_poses), params, backend=backend,
            white_background=model.white_background)

    if not skip_test and not infer_video:
        test_info = scene_io.read_scene(
            model.source_path, model.n_views, split="test",
            images_dir=model.images)
        poses7 = _w2c_to_pose7(test_info.poses_w2c)
        render_set_optimize(
            model_path, "test", iteration, test_info.cameras, poses7,
            params, backend=backend,
            white_background=model.white_background,
            num_iter=optim_test_pose_iter, test_fps=test_fps, mesh=mesh)

    if infer_video:
        inter = save_interpolated_poses(
            model_path, iteration, model.n_views, seconds=video_seconds)
        cam0 = train_info.cameras[0]
        cams = [cam0.replace(image=None) for _ in range(len(inter))]
        out_dir = render_view_set(
            model_path, "interp", iteration, cams, _w2c_to_pose7(inter),
            params, backend=backend,
            white_background=model.white_background, save_gt=False)
        frames_to_video(
            out_dir / "renders",
            model_path / f"interp_{model.n_views}_view.mp4")
    return iteration
