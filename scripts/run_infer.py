#!/usr/bin/env python
"""Inference orchestrator: init_geo(video) -> train -> interpolated video.

Equivalent of the reference scripts/run_infer.sh:50-83 — all images are
training views (no split), and the render stage produces the 10 s / 30 fps
spline-interpolated novel-view video.

  python scripts/run_infer.py --data <root> --out <out> --scenes <s...> \
      --n_views N --ckpt_path <mast3r.pth>
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts.run_eval import run_stage  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--scenes", nargs="+", required=True)
    ap.add_argument("--n_views", type=int, default=3)
    ap.add_argument("--iterations", type=int, default=1000)
    ap.add_argument("--ckpt_path", default="")
    args = ap.parse_args()

    py = [sys.executable, "-m"]
    for scene in args.scenes:
        src = Path(args.data) / scene
        out = Path(args.out) / scene / f"{args.n_views}_views"
        logs = out / "logs"
        nv, it = str(args.n_views), str(args.iterations)
        ok = run_stage(
            py + ["instantsplat_tpu.cli.init_geo", "-s", str(src),
                  "-m", str(out), "--n_views", nv,
                  "--ckpt_path", args.ckpt_path, "--focal_avg",
                  "--infer_video"],
            logs / "01_init_geo.log")
        ok = ok and run_stage(
            py + ["instantsplat_tpu.cli.train", "-s", str(src),
                  "-m", str(out), "--n_views", nv, "--iterations", it,
                  "--pp_optimizer", "--optim_pose"],
            logs / "02_train.log")
        ok = ok and run_stage(
            py + ["instantsplat_tpu.cli.render", "-s", str(src),
                  "-m", str(out), "--n_views", nv, "--iteration", it,
                  "--skip_test", "--infer_video"],
            logs / "03_render_video.log")
        print(f"== {scene}: {'DONE' if ok else 'FAILED'} ==")


if __name__ == "__main__":
    main()
