"""Dense vs 1-D binned vs 2-D tiled rasterizer regime benchmark (real chip).

Extends scripts/bench_binned.py with the 2-D tiled kernel
(ops/rasterize_pallas_tiled — PERF_NOTES roadmap item 6) and the regime
that motivated it: small-splat, near-uniform-depth scenes (the realistic
fused-cloud training workload where the 1-D binned kernel ran ~450 ms/iter
at ~0.5% falloff-block occupancy).

Scenes:
  spread      random cloud, depth 1.5-sigma around 6 (bench_binned's)
  small       same with 4x smaller splats
  plane       ~uniform depth (dominant-plane scene, the e2e pathological
              regime), small splats, optional --n 400000

Per scene: forward ms for each backend (auto-sized capacities), then a
full train-iteration (fwd+bwd+Adam scanned block) for the backends that
matter. Chained-dependency timing per CLAUDE.md.

  python scripts/bench_tiled.py [--n 100000] [--iters 20] [--plane-n 400000]
      [--scenes spread small plane] [--train] [--sweep]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _make_scene(kind, n, seed=0):
    import jax
    import jax.numpy as jnp

    from instantsplat_tpu.models.gaussians import GaussianModel

    # scene construction in NUMPY: eager jnp ops with fresh shapes each
    # compile separately over the axon tunnel (measured: a 6-op grid
    # build stalled a bench run for 40 minutes — CLAUDE.md)
    rng = np.random.default_rng(seed)
    if kind == "plane":
        # dominant plane: tiny depth spread defeats depth-slicing/bitmaps.
        # Points on a JITTERED GRID, like a fused backprojected cloud —
        # a gaussian xy scatter gives KNN-scale splats a heavy tail at
        # the sparse edges (measured: auto-sized dy_levels 25 vs the e2e
        # scene's 4-7), which is unrepresentative of co-vis-masked
        # production clouds.
        side = int(np.ceil(np.sqrt(n)))
        gy, gx = np.meshgrid(np.arange(side), np.arange(side))
        g = (np.stack([gx, gy], -1).reshape(-1, 2)[:n]
             / side - 0.5) * 3.6
        xy = g + rng.standard_normal((n, 2)) * (0.2 * 3.6 / side)
        z = 6.0 + rng.standard_normal((n, 1)) * 0.05
        pts = jnp.asarray(np.concatenate([xy, z], 1), jnp.float32)
    else:
        pts = jnp.asarray(
            rng.standard_normal((n, 3)) * 1.5 + [0.0, 0.0, 6.0],
            jnp.float32)
    cols = jnp.asarray(rng.random((n, 3)), jnp.float32)
    poses = jnp.tile(jnp.array([1.0, 0, 0, 0, 0, 0, 0]), (2, 1))
    base = GaussianModel.create_from_pcd(pts, cols, cam_poses=poses,
                                         max_sh_degree=3)
    if kind in ("small", "plane"):
        base = base.replace(scaling=base.scaling + float(np.log(0.25)))
    return base


def _backends_for(params, cam):
    """Auto-sized backend strings, like the production auto-selection."""
    from instantsplat_tpu.render.driver import (
        binned_view_requirements,
        tiled_view_requirements,
    )

    out = {"dense": "pallas"}
    try:
        cf, dl = binned_view_requirements(params, params.get_pose(0), cam)
        out["binned"] = f"pallas-binned:{cf}:{dl}"
    except Exception as e:  # noqa: BLE001
        out["binned_err"] = str(e)
    try:
        cf, dy, dx = tiled_view_requirements(params, params.get_pose(0), cam)
        out["tiled"] = f"pallas-tiled:{cf}:{dy}:{dx}"
    except Exception as e:  # noqa: BLE001
        out["tiled_err"] = str(e)
    return out


def bench_forward(params, cam, backend, iters):
    import jax
    import jax.numpy as jnp

    from instantsplat_tpu.render.driver import render

    f = jax.jit(lambda p: render(p, cam, pose=p.get_pose(0),
                                 backend=backend).render)
    img = f(params)
    jax.block_until_ready(img)
    p = params
    t0 = time.perf_counter()
    for _ in range(iters):
        # relative nudge: an additive 1e-12 rounds away in f32 at |xyz|~2,
        # making every dispatch bit-identical -> worker value-dedup
        # returns without executing (measured an impossible 0.2 ms)
        p = p.replace(xyz=p.xyz * (1.0 + 1e-7) + 1e-9 * jnp.mean(img))
        img = f(p)
    float(jnp.sum(img[::64, ::64]))  # host read: block_until_ready can
    # return pre-execution on axon
    return (time.perf_counter() - t0) / iters * 1e3


def bench_train_iter(params, cam, backend, iters):
    """Full train step (render fwd+bwd + grouped Adam) in a scanned
    block — the trainer's production dispatch shape."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from instantsplat_tpu.models.camera import stack_cameras
    from instantsplat_tpu.opt import GaussianOptimizer, OptimizationConfig
    from instantsplat_tpu.pipelines.trainer import make_train_scan
    from instantsplat_tpu.render.driver import render

    gt = render(params, cam, pose=params.get_pose(0),
                backend="pallas").render
    cam_gt = cam.replace(image=jnp.clip(gt, 0.0, 1.0))
    stacked = stack_cameras([cam_gt, cam_gt])
    opt = GaussianOptimizer(OptimizationConfig(optim_pose=True),
                            total_iterations=1000)
    state = opt.init(params)
    block = make_train_scan(opt, stacked, jnp.zeros(3), 0.2,
                            backend=backend, chunk=512)
    k = iters
    vids = jnp.asarray(np.arange(k) % 2, jnp.int32)
    its = jnp.arange(1, k + 1, dtype=jnp.int32)
    p, s, m = block(params, state, vids, its, 3)
    float(jnp.sum(m["loss"]))
    # warm timed block chained through the updated params
    t0 = time.perf_counter()
    p, s, m = block(p, s, vids, its, 3)
    float(jnp.sum(m["loss"]))  # host read, not block_until_ready (axon)
    return (time.perf_counter() - t0) / k * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--plane-n", type=int, default=400_000)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--hw", type=int, nargs=2, default=[384, 512])
    ap.add_argument("--scenes", nargs="+",
                    default=["spread", "small", "plane"])
    ap.add_argument("--opacities", type=float, nargs="+",
                    default=[2.0, -3.0])
    ap.add_argument("--train", action="store_true",
                    help="also time full train iterations (slower)")
    ap.add_argument("--backends", nargs="+",
                    default=["dense", "binned", "tiled"])
    ap.add_argument("--sweep", action="store_true",
                    help="sweep tiled tile geometry (BLOCK_ROWS x COL_W "
                         "x G_CHUNK x SCAN_IMPL) on the plane scene, "
                         "forward only")
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from instantsplat_tpu.models.camera import Camera

    h, w = args.hw
    cam = Camera.create(np.eye(3), np.zeros(3), fx=400.0, fy=400.0,
                        height=h, width=w, uid=0)
    cam1 = cam.replace(uid=1)  # noqa: F841

    if args.sweep:
        from instantsplat_tpu.ops import rasterize_pallas_tiled as rpt

        base = _make_scene("plane", args.plane_n)
        params = base.replace(
            opacity=jnp.full_like(base.opacity, args.opacities[0]))
        for br, cw, gch, scan in [
            (8, 128, 256, "roll"), (8, 128, 256, "mxu"),
            (8, 128, 512, "roll"), (4, 128, 256, "roll"),
            (16, 128, 256, "roll"), (8, 256, 256, "roll"),
        ]:
            rpt.BLOCK_ROWS, rpt.COL_W, rpt.G_CHUNK = br, cw, gch
            rpt.SCAN_IMPL = scan
            try:
                strings = _backends_for(params, cam)
                be = strings["tiled"]
                ms = bench_forward(params, cam, be, args.iters)
                print(json.dumps({"sweep": [br, cw, gch, scan],
                                  "backend": be,
                                  "fwd_ms": round(ms, 2)}), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"sweep": [br, cw, gch, scan],
                                  "err": f"{type(e).__name__}: {e}"[:150]}),
                      flush=True)
        return

    for kind in args.scenes:
        n = args.plane_n if kind == "plane" else args.n
        base = _make_scene(kind, n)
        for logit in args.opacities:
            params = base.replace(
                opacity=jnp.full_like(base.opacity, logit))
            strings = _backends_for(params, cam)
            row = {"scene": kind, "n": n, "opacity_logit": logit,
                   "backends": strings}
            for name in args.backends:
                be = strings.get(name)
                if be is None:
                    continue
                try:
                    row[f"fwd_ms_{name}"] = round(
                        bench_forward(params, cam, be, args.iters), 2)
                    print(json.dumps({"progress": f"fwd_{name}",
                                      "ms": row[f"fwd_ms_{name}"]}),
                          flush=True)
                except Exception as e:  # noqa: BLE001
                    row[f"fwd_err_{name}"] = f"{type(e).__name__}: {e}"[:200]
                    print(json.dumps({"progress": f"fwd_{name}",
                                      "err": row[f"fwd_err_{name}"]}),
                          flush=True)
            if args.train:
                for name in args.backends:
                    be = strings.get(name)
                    if be is None:
                        continue
                    try:
                        row[f"train_ms_{name}"] = round(
                            bench_train_iter(params, cam, be, args.iters),
                            2)
                        print(json.dumps({"progress": f"train_{name}",
                                          "ms": row[f"train_ms_{name}"]}),
                              flush=True)
                    except Exception as e:  # noqa: BLE001
                        row[f"train_err_{name}"] = (
                            f"{type(e).__name__}: {e}"[:200])
                        print(json.dumps({"progress": f"train_{name}",
                                          "err": row[f"train_err_{name}"]}),
                              flush=True)
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
