#!/usr/bin/env python
"""Evaluation orchestrator: the 5-stage pipeline over a list of scenes.

Equivalent of the reference scripts/run_eval.sh:56-165 — per scene:
init_geo -> train -> render(train) -> render(test, pose-opt) -> metrics —
with per-stage logs under <out>/logs/. The reference parallelizes scenes
across GPUs by polling nvidia-smi; on a TPU host run one scene per chip
process (or sequentially on a single chip, the default here).

  python scripts/run_eval.py --data <root> --out <root_out> \
      --dataset Tanks --scenes Barn Family --n_views 3 \
      --ckpt_path <mast3r.pth> [--iterations 1000]
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
from pathlib import Path


def run_stage(cmd, log_path):
    log_path.parent.mkdir(parents=True, exist_ok=True)
    with open(log_path, "w") as log:
        t0 = time.time()
        print(f">> {' '.join(cmd)}")
        ret = subprocess.run(cmd, stdout=log, stderr=subprocess.STDOUT)
        dt = time.time() - t0
        print(f"   -> {'ok' if ret.returncode == 0 else 'FAIL'} "
              f"({dt:.0f}s, log: {log_path})")
        return ret.returncode == 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--dataset", default="")
    ap.add_argument("--scenes", nargs="+", required=True)
    ap.add_argument("--n_views", type=int, default=3)
    ap.add_argument("--iterations", type=int, default=1000)
    ap.add_argument("--ckpt_path", default="")
    ap.add_argument("--skip_init", action="store_true",
                    help="scene dirs already contain sparse_{n}")
    args = ap.parse_args()

    py = [sys.executable, "-m"]
    for scene in args.scenes:
        src = Path(args.data) / args.dataset / scene / "24_views"
        if not src.exists():
            src = Path(args.data) / args.dataset / scene
        out = (Path(args.out) / args.dataset / scene
               / f"{args.n_views}_views")
        logs = out / "logs"
        nv = str(args.n_views)
        it = str(args.iterations)

        ok = True
        if not args.skip_init:
            ok = run_stage(
                py + ["instantsplat_tpu.cli.init_geo", "-s", str(src),
                      "-m", str(out), "--n_views", nv,
                      "--ckpt_path", args.ckpt_path, "--focal_avg",
                      "--co_vis_dsp", "--conf_aware_ranking"],
                logs / "01_init_geo.log")
        ok = ok and run_stage(
            py + ["instantsplat_tpu.cli.train", "-s", str(src),
                  "-m", str(out), "--n_views", nv, "--iterations", it,
                  "--pp_optimizer", "--optim_pose"],
            logs / "02_train.log")
        ok = ok and run_stage(
            py + ["instantsplat_tpu.cli.render", "-s", str(src),
                  "-m", str(out), "--n_views", nv, "--iteration", it,
                  "--skip_test"],
            logs / "03_render_train.log")
        ok = ok and run_stage(
            py + ["instantsplat_tpu.cli.render", "-s", str(src),
                  "-m", str(out), "--n_views", nv, "--iteration", it,
                  "--skip_train", "--eval", "--test_fps"],
            logs / "04_render_test.log")
        ok = ok and run_stage(
            py + ["instantsplat_tpu.cli.metrics", "-m", str(out),
                  "-s", str(src), "--n_views", nv],
            logs / "05_metrics.log")
        print(f"== {scene}: {'DONE' if ok else 'FAILED'} ==")


if __name__ == "__main__":
    main()
