"""Stage 5: image + pose evaluation over rendered test sets.

Pipeline equivalent of the reference metrics.py:35-125 (SURVEY.md §3.4):
per method dir under <model>/test/, compute PSNR/SSIM/LPIPS over
renders-vs-gt pairs and ATE/RPE over optimized-vs-COLMAP-GT train poses,
writing metrics.txt, pose_eval.txt, results.json and per_view.json with
the reference's exact units (RPE_t x100, RPE_r in degrees).

LPIPS is reported as None when no weights are available in the environment
(see eval/image_metrics.py docstring).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from instantsplat_tpu.data import images as image_io, scene as scene_io
from instantsplat_tpu.eval import image_metrics, pose_metrics


def read_render_pairs(method_dir):
    renders_dir = Path(method_dir) / "renders"
    gt_dir = Path(method_dir) / "gt"
    names = sorted(p.name for p in renders_dir.glob("*.png"))
    renders = [image_io.load_image(renders_dir / n) for n in names]
    gts = [image_io.load_image(gt_dir / n) for n in names]
    return renders, gts, names


def evaluate_images(method_dir, lpips_params=None):
    """-> (summary dict, per-view dict); writes metrics.txt."""
    import jax
    import jax.numpy as jnp

    # one jit for the per-view metric pair: eager ssim/psnr would compile
    # each constituent op separately, which is pathologically slow over a
    # remote-device tunnel (see init/aligner.py _set_pose note).
    ssim_psnr = jax.jit(
        lambda r, g: (image_metrics.ssim(r, g), image_metrics.psnr(r, g)))

    renders, gts, names = read_render_pairs(method_dir)
    ssims, psnrs, lpipss = [], [], []
    have_lpips = (lpips_params is not None
                  or image_metrics._DEFAULT is not None)
    with open(Path(method_dir) / "metrics.txt", "w") as out_f:
        for idx, (r, g, name) in enumerate(zip(renders, gts, names)):
            r_j, g_j = jnp.asarray(r), jnp.asarray(g)
            s_j, p_j = ssim_psnr(r_j, g_j)
            s, p = float(s_j), float(p_j)
            l = (float(image_metrics.lpips(r_j, g_j, lpips_params))
                 if have_lpips else None)
            ssims.append(s)
            psnrs.append(p)
            lpipss.append(l)
            l_str = f"{l:.4f}" if l is not None else "n/a"
            out_f.write(
                f"image name{name}, image idx: {idx}, PSNR: {p:.2f}, "
                f"SSIM: {s:.4f}, LPIPS: {l_str}\n")
    summary = {
        "SSIM": float(np.mean(ssims)) if ssims else None,
        "PSNR": float(np.mean(psnrs)) if psnrs else None,
        "LPIPS": (float(np.mean([x for x in lpipss]))
                  if have_lpips and lpipss else None),
    }
    per_view = {
        "SSIM": dict(zip(names, ssims)),
        "PSNR": dict(zip(names, psnrs)),
        "LPIPS": dict(zip(names, lpipss)),
    }
    return summary, per_view


def evaluate_poses_against_colmap(model_path, method, source_path, n_views):
    """metrics.py:88-118: optimized train poses vs the dataset's COLMAP GT.

    pose_optimized.npy stores w2c; the GT reader returns c2w — invert to
    compare in c2w like the reference (read_colmap_gt_pose yields c2w).
    """
    pose_path = Path(model_path) / "pose" / method
    pose_optimized = np.load(pose_path / "pose_optimized.npy")
    est_c2w = np.linalg.inv(pose_optimized)
    gt_c2w_all = scene_io.read_colmap_gt_pose(source_path)
    gt_train, _, _, _ = scene_io.split_train_test(
        list(gt_c2w_all), n_views)
    gt_c2w = np.stack(gt_train)
    res = pose_metrics.evaluate_pose(est_c2w, gt_c2w)
    with open(pose_path / "pose_eval.txt", "w") as f:
        f.write("RPE_t: {:.04f}, RPE_r: {:.04f}, ATE: {:.04f}".format(
            res["RPE_t"], res["RPE_r"], res["ATE"]))
    try:  # trajectory comparison plot (reference plot_pose, metrics.py:112)
        from instantsplat_tpu.eval.pose_viz import plot_pose

        plot_pose(gt_c2w, est_c2w, pose_path / "pose_vis.png")
    except Exception as e:  # matplotlib quirks must not fail the metrics
        print(f"[metrics] pose plot skipped: {e}")
    return res


def run_metrics(model_paths, source_path=None, n_views=None,
                lpips_params=None, eval_pose=True):
    """Full evaluate() flow; returns the results dict per scene."""
    full, per_view_all = {}, {}
    for scene_dir in model_paths:
        scene_dir = str(scene_dir)
        full[scene_dir] = {}
        per_view_all[scene_dir] = {}
        test_dir = Path(scene_dir) / "test"
        if not test_dir.exists():
            print(f"[metrics] no test renders under {scene_dir}")
            continue
        for method_dir in sorted(test_dir.iterdir()):
            if not method_dir.is_dir():
                continue
            method = method_dir.name
            summary, per_view = evaluate_images(method_dir, lpips_params)
            full[scene_dir][method] = summary
            per_view_all[scene_dir][method] = per_view
            if eval_pose and source_path is not None:
                try:
                    res = evaluate_poses_against_colmap(
                        scene_dir, method, source_path, n_views)
                    full[scene_dir][method].update(res)
                except (OSError, ValueError) as e:
                    print(f"[metrics] pose eval skipped: {e}")
        with open(Path(scene_dir) / "results.json", "w") as f:
            json.dump(full[scene_dir], f, indent=True)
        with open(Path(scene_dir) / "per_view.json", "w") as f:
            json.dump(per_view_all[scene_dir], f, indent=True)
    return full
