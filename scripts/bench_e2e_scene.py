"""Forced-backend rasterizer comparison on a REAL pipeline-written scene.

The regime benches (bench_binned/bench_tiled) use synthetic clouds whose
KNN-scale radius tails are unrepresentative; this script loads an actual
sparse_{n} scene directory produced by the init_geo pipeline (the
production operating point — e.g. the bench_e2e oracle scene after
co-vis + max_pts downsampling) and times forward + full train iterations
for each backend at its drop-free auto-sized capacities, plus any extra
backend strings given on the command line (e.g. a tiled config above the
auto-selection product cap, to test whether the cap is leaving speed on
the table).

  python scripts/bench_e2e_scene.py --scene /tmp/is_e2e_r5/data/plane \
      --model /tmp/is_e2e_r5/out_r5prod/plane/3_views --n_views 3 \
      [--iters 10] [--extra pallas-tiled:4:26:3]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", required=True)
    ap.add_argument("--n_views", type=int, default=3)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--extra", nargs="*", default=[],
                    help="additional backend strings to time")
    ap.add_argument("--train", action="store_true")
    args = ap.parse_args()

    import numpy as np

    from instantsplat_tpu.data import scene as scene_io
    from instantsplat_tpu.models.gaussians import GaussianModel
    from bench_tiled import _backends_for, bench_forward, bench_train_iter

    info = scene_io.read_scene(args.scene, args.n_views, split="train")
    cam_poses = GaussianModel.init_cam_poses_from_w2c(info.poses_w2c)
    params = GaussianModel.create_from_pcd(
        np.asarray(info.points), np.asarray(info.colors),
        cam_poses=cam_poses, max_sh_degree=3)
    cam = info.cameras[0]
    strings = _backends_for(params, cam)
    for i, extra in enumerate(args.extra):
        strings[f"extra{i}:{extra}"] = extra
    row = {"scene": args.scene, "n": int(params.xyz.shape[0]),
           "hw": [int(cam.height), int(cam.width)], "backends": strings}
    print(json.dumps(row), flush=True)
    for name, be in strings.items():
        if be is None or name.endswith("_err"):
            continue
        try:
            ms = bench_forward(params, cam, be, args.iters)
            print(json.dumps({"backend": name, "fwd_ms": round(ms, 2)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"backend": name,
                              "fwd_err": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)
        if args.train:
            try:
                ms = bench_train_iter(params, cam, be, args.iters)
                print(json.dumps({"backend": name,
                                  "train_ms": round(ms, 2)}), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps(
                    {"backend": name,
                     "train_err": f"{type(e).__name__}: {e}"[:200]}),
                    flush=True)


if __name__ == "__main__":
    main()
