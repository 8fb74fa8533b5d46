"""Full 5-stage pipeline wall-time benchmark on the real chip.

Generates a synthetic textured-plane scene at the reference eval workload
(512-long-side images, 3 training views picked from a 14-image pool —
scripts/run_eval.sh:36-39 semantics), writes a GT COLMAP model for the
pose metrics, then drives the production orchestrator (scripts/run_eval.py:
init_geo -> train -> render(train) -> render(test, pose-opt) -> metrics)
and prints the per-stage wall times + results.json.

Stage 1 runs the real ViT-L MASt3R architecture with random weights (no
checkpoints exist in this environment — the geometry is garbage but the
compute is the production compute; the synthetic GT COLMAP keeps the
metrics stage meaningful as a harness check). Run twice to separate
compile from steady state: the first run pays XLA/Mosaic compiles over
the dev tunnel, the second rides the persistent compile cache.

  python scripts/bench_e2e.py [--root /tmp/is_e2e] [--iterations 1000]
"""

from __future__ import annotations

import argparse
import json
import re
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

H, W = 384, 512
FOCAL = 480.0
N_IMAGES = 14


def _rot_y(a):
    return np.array([
        [np.cos(a), 0, np.sin(a)],
        [0, 1, 0],
        [-np.sin(a), 0, np.cos(a)],
    ])


def _texture(x, y):
    r = 0.5 + 0.45 * np.sin(2.2 * x) * np.cos(1.7 * y)
    g = 0.5 + 0.45 * np.sin(1.3 * x + 1.0) * np.sin(2.9 * y)
    b = 0.5 + 0.45 * np.cos(2.0 * x - 0.5) * np.cos(1.1 * y + 0.3)
    return np.stack([r, g, b], -1)


def _surface_z(x, y):
    """World-space height field: a bumpy surface (multi-view consistent).

    A perfectly flat z=3 plane is ADVERSARIAL for depth-chunked
    rasterization (every depth chunk spans the whole image — the
    documented pathological regime) and unrepresentative of real capture;
    the bumps give the fused cloud the depth diversity real scenes have.
    """
    return (3.0 + 0.35 * np.sin(1.3 * x) * np.cos(0.9 * y)
            + 0.15 * np.sin(2.7 * x + 1.1))


def scene_geometry():
    """Per-view (c2w, world points, camera-frame points, image array)."""
    gx, gy = np.meshgrid(np.arange(W), np.arange(H))
    dirs = np.stack([(gx - W / 2) / FOCAL, (gy - H / 2) / FOCAL,
                     np.ones_like(gx)], -1)
    c2ws, pts_world, pts_cam, images = [], [], [], []
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
        # fixed-point ray/height-field intersection (shallow bumps
        # converge in a few sweeps; identical surface for every view)
        lam = (3.0 - center[2]) / d_world[..., 2]
        for _ in range(12):
            pw = center + lam[..., None] * d_world
            lam = (_surface_z(pw[..., 0], pw[..., 1]) - center[2]) \
                / d_world[..., 2]
        pw = center + lam[..., None] * d_world
        pts_world.append(pw)
        pts_cam.append((pw - center) @ R)
        images.append(_texture(pw[..., 0], pw[..., 1]))
    return (np.stack(c2ws), np.stack(pts_world), np.stack(pts_cam),
            np.stack(images))


def make_scene(scene_dir: Path):
    """14 posed views of a textured plane + GT COLMAP model (sparse/0)."""
    from PIL import Image

    from instantsplat_tpu.data import colmap

    img_dir = scene_dir / "images"
    img_dir.mkdir(parents=True, exist_ok=True)
    c2ws, _, _, images = scene_geometry()
    cams = {1: colmap.ColmapCamera(1, "PINHOLE", W, H,
                                   np.array([FOCAL, FOCAL, W / 2, H / 2]))}
    ims = {}
    for v in range(N_IMAGES):
        img = (np.clip(images[v], 0, 1) * 255).astype(np.uint8)
        name = f"{v:03d}.png"
        Image.fromarray(img).save(img_dir / name)
        w2c = np.linalg.inv(c2ws[v])
        ims[v + 1] = colmap.ColmapImage(
            v + 1, colmap.rotmat_to_qvec(w2c[:3, :3]), w2c[:3, 3], 1, name)
    gt = scene_dir / "sparse" / "0"
    gt.mkdir(parents=True, exist_ok=True)
    colmap.write_cameras_text(cams, gt / "cameras.txt")
    colmap.write_images_text(ims, gt / "images.txt")


def init_oracle(scene_dir: Path, model_dir: Path, n_views=3,
                max_pts=0):
    """Stage 1 with EXACT pointmaps (the e2e tests' oracle backend at the
    production resolution): produces a realistic converged sparse_{n}
    scene so stages 2-5 measure the representative workload, with stage-1
    wall time reported separately (its MASt3R forward is random-weight in
    this environment either way)."""
    import time as _t

    from instantsplat_tpu.data import images as image_io, scene as scene_io
    from instantsplat_tpu.init.aligner import PairPrediction
    from instantsplat_tpu.pipelines.init_geo_pipeline import run_init_geo

    c2ws, pts_world, pts_cam, _ = scene_geometry()
    files, _sfx = image_io.sorted_image_files(scene_dir / "images")
    _, _, train_idx, _ = scene_io.split_train_test(files, n_views)
    rng = np.random.default_rng(0)

    def fn(imgs, pairs):
        pred_i = np.stack(
            [pts_cam[train_idx[i]] for i, j in pairs]).astype(np.float32)
        pred_j = np.stack([
            (pts_world[train_idx[j]] - c2ws[train_idx[i], :3, 3])
            @ c2ws[train_idx[i], :3, :3]
            for i, j in pairs
        ]).astype(np.float32)
        conf = 1.0 + np.exp(
            rng.random((len(pairs), H, W)).astype(np.float32))
        return PairPrediction(edges=list(pairs), pred_i=pred_i,
                              pred_j=pred_j, conf_i=conf,
                              conf_j=conf * 1.05)

    t0 = _t.time()
    run_init_geo(scene_dir, model_dir, fn, n_views=n_views,
                 focal_avg=True, co_vis_dsp=True, conf_aware_ranking=True,
                 save_all_pts=True,
                 max_pts=max_pts if max_pts else int(150e10))
    print(f"[oracle init_geo] {_t.time() - t0:.0f}s", flush=True)


def run_once(root: Path, iterations: int, tag: str,
             oracle: bool = False, record: bool = True,
             pose_iters: int = 500, max_pts: int = 0) -> bool:
    out = root / f"out_{tag}"
    cmd = [sys.executable, str(Path(__file__).parent / "run_eval.py"),
           "--data", str(root / "data"), "--out", str(out),
           "--scenes", "plane", "--n_views", "3", "--ckpt_path", "random",
           "--iterations", str(iterations), "--stage_timeout", "3600",
           "--optim_test_pose_iter", str(pose_iters)]
    if max_pts:
        cmd += ["--max_pts", str(max_pts)]
    if oracle:
        init_oracle(root / "data" / "plane", out / "plane" / "3_views",
                    max_pts=max_pts)
        cmd.append("--skip_init")
    t0 = time.time()
    repo_root = Path(__file__).resolve().parent.parent
    ret = subprocess.run(cmd, cwd=repo_root, capture_output=True, text=True)
    total = time.time() - t0
    sys.stdout.write(ret.stdout)
    sys.stderr.write(ret.stderr)
    ok = ret.returncode == 0
    print(f"\n== {tag}: total wall {total:.0f}s "
          f"({'ok' if ok else 'FAILED'}) ==")
    scene_out = out / "plane" / "3_views"
    stages = {}
    # run_eval.py prints '   -> ok (123s, log: .../01_init_geo.log)'
    for m in re.finditer(r"-> (ok|FAIL) \((\d+)s, log: .*/(\d\d_\w+)\.log",
                         ret.stdout):
        stages[m.group(3)] = int(m.group(2))
    tt = scene_out / "train_time.txt"
    if tt.exists():
        print(tt.read_text())
    res = scene_out / "results.json"
    summary = None
    if res.exists():
        print(re.sub(r"\s+", " ", res.read_text())[:400])
        try:
            summary = next(iter(json.loads(res.read_text()).values()))
        except Exception:
            pass
    # time-to-PSNR from the training scalar stream (BASELINE.md north
    # star is time-to-quality, not just wall total)
    t2p = {}
    scal = scene_out / "scalars.jsonl"
    if scal.exists():
        best = {}
        for line in scal.read_text().splitlines():
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if rec.get("tag") == "train/psnr":
                best[rec["step"]] = (rec["value"], rec["wall"])
        for thr in (30, 40, 50):
            hit = [(s, w) for s, (v, w) in sorted(best.items()) if v >= thr]
            if hit:
                t2p[f"train_psnr_{thr}"] = {
                    "iteration": hit[0][0], "wall_s": round(hit[0][1], 1)}
    if record and ok:
        # the stage table bench.py folds into its multi-metric line
        # (VERDICT r3 item 2); overwritten by each successful run
        json.dump({
            "tag": tag,
            "mode": "oracle" if oracle else "random-weight",
            "iterations": iterations,
            "optim_test_pose_iter": pose_iters,
            "max_pts": max_pts or None,
            "total_wall_s": round(total, 1),
            "stage_wall_s": stages,
            "time_to_psnr": t2p,
            "results": summary,
            "recorded_unix": int(time.time()),
        }, open(repo_root / "BENCH_E2E.json", "w"), indent=1)
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/is_e2e")
    ap.add_argument("--iterations", type=int, default=1000)
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--tag", default="")
    ap.add_argument("--pose_iters", type=int, default=500,
                    help="test-time pose-opt iterations per view "
                         "(reference default 500; lower for harness runs "
                         "on congested dev backends — recorded in the "
                         "output)")
    ap.add_argument("--max_pts", type=int, default=0,
                    help="cap the fused cloud (confidence-weighted "
                         "downsample) — the production point budget is "
                         "100-150k for 3-view 512-res scenes")
    ap.add_argument("--oracle", action="store_true",
                    help="stage 1 with exact oracle pointmaps (realistic "
                    "converged scene for stages 2-5; random-weight MASt3R "
                    "otherwise)")
    args = ap.parse_args()
    root = Path(args.root)
    scene_dir = root / "data" / "plane"
    if not (scene_dir / "images").exists():
        make_scene(scene_dir)
        print(f"scene written under {scene_dir}")
    for i in range(args.runs):
        tag = args.tag or f"run{int(time.time())}_{i}"
        if not run_once(root, args.iterations, tag, oracle=args.oracle,
                        pose_iters=args.pose_iters, max_pts=args.max_pts):
            sys.exit(1)


if __name__ == "__main__":
    main()
