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
import re
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

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


def make_scene(scene_dir: Path):
    """14 posed views of a textured plane + GT COLMAP model (sparse/0)."""
    from PIL import Image

    from instantsplat_tpu.data import colmap

    img_dir = scene_dir / "images"
    img_dir.mkdir(parents=True, exist_ok=True)
    gx, gy = np.meshgrid(np.arange(W), np.arange(H))
    dirs = np.stack([(gx - W / 2) / FOCAL, (gy - H / 2) / FOCAL,
                     np.ones_like(gx)], -1)
    cams = {1: colmap.ColmapCamera(1, "PINHOLE", W, H,
                                   np.array([FOCAL, FOCAL, W / 2, H / 2]))}
    ims = {}
    for v in range(N_IMAGES):
        ang = 0.05 * (v - (N_IMAGES - 1) / 2)
        R = _rot_y(ang)
        center = np.array([1.5 * np.sin(ang), 0.02 * v,
                           -1.5 * (1 - np.cos(ang))])
        d_world = dirs @ R.T
        lam = (3.0 - center[2]) / d_world[..., 2]
        pw = center + lam[..., None] * d_world
        img = (np.clip(_texture(pw[..., 0], pw[..., 1]), 0, 1)
               * 255).astype(np.uint8)
        name = f"{v:03d}.png"
        Image.fromarray(img).save(img_dir / name)
        w2c_R = R.T
        w2c_t = -R.T @ center
        ims[v + 1] = colmap.ColmapImage(
            v + 1, colmap.rotmat_to_qvec(w2c_R), w2c_t, 1, name)
    gt = scene_dir / "sparse" / "0"
    gt.mkdir(parents=True, exist_ok=True)
    colmap.write_cameras_text(cams, gt / "cameras.txt")
    colmap.write_images_text(ims, gt / "images.txt")


def run_once(root: Path, iterations: int, tag: str) -> bool:
    out = root / f"out_{tag}"
    t0 = time.time()
    ret = subprocess.run(
        [sys.executable, str(Path(__file__).parent / "run_eval.py"),
         "--data", str(root / "data"), "--out", str(out),
         "--scenes", "plane", "--n_views", "3", "--ckpt_path", "random",
         "--iterations", str(iterations)],
        cwd=Path(__file__).resolve().parent.parent)
    total = time.time() - t0
    ok = ret.returncode == 0
    print(f"\n== {tag}: total wall {total:.0f}s "
          f"({'ok' if ok else 'FAILED'}) ==")
    tt = out / "plane" / "3_views" / "train_time.txt"
    if tt.exists():
        print(tt.read_text())
    res = out / "plane" / "3_views" / "results.json"
    if res.exists():
        print(re.sub(r"\s+", " ", res.read_text())[:400])
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/is_e2e")
    ap.add_argument("--iterations", type=int, default=1000)
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--tag", default="")
    args = ap.parse_args()
    root = Path(args.root)
    scene_dir = root / "data" / "plane"
    if not (scene_dir / "images").exists():
        make_scene(scene_dir)
        print(f"scene written under {scene_dir}")
    for i in range(args.runs):
        tag = args.tag or f"run{int(time.time())}_{i}"
        if not run_once(root, args.iterations, tag):
            sys.exit(1)


if __name__ == "__main__":
    main()
