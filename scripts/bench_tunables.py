"""Sweep the dense-kernel tunables on the real chip (chained timing).

The kernel constants (rasterize_pallas.G_CHUNK grouping via
CHUNKS_PER_STEP, BLOCK_ROWS pixel-block height, STRIP_ROWS VMEM strip
height) were picked by round-1 measurement at 256-row strips; this sweeps
them at bench.py's exact workload to find the current optimum. Of note:
at 384 rows, STRIP_ROWS=256 splits the image into a 256 + 128 strip, each
re-running the full chunk grid — STRIP_ROWS >= 384 single-launches the
image if Mosaic accepts the VMEM footprint (state is ~8 arrays x
[n_rb, BLOCK_ROWS*W_pad] f32 ~= 6.3 MB at 384x512).

Usage: python scripts/bench_tunables.py [--iters 20]
Prints one line per (strip_rows, chunks_per_step, block_rows) config.
"""

from __future__ import annotations

import argparse
import importlib
import time

import numpy as np

import sys as _sys
from pathlib import Path as _P
_sys.path.insert(0, str(_P(__file__).resolve().parent.parent))


def build_workload():
    import jax
    import jax.numpy as jnp

    from instantsplat_tpu.models.camera import Camera, stack_cameras
    from instantsplat_tpu.models.gaussians import GaussianModel
    from instantsplat_tpu.opt import GaussianOptimizer, OptimizationConfig
    from instantsplat_tpu.pipelines.trainer import make_train_scan
    from instantsplat_tpu.render.driver import render

    N, H, W = 100_000, 384, 512
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    pts = jax.random.normal(ks[0], (N, 3)) * 1.5 + jnp.array([0.0, 0.0, 6.0])
    cols = jax.random.uniform(ks[1], (N, 3))
    poses = jnp.tile(jnp.array([1.0, 0, 0, 0, 0, 0, 0]), (2, 1))
    params = GaussianModel.create_from_pcd(pts, cols, cam_poses=poses,
                                           max_sh_degree=3)
    opaque = params.replace(opacity=jnp.full_like(params.opacity, 2.0))
    cams = []
    for i in range(2):
        cam0 = Camera.create(np.eye(3), np.zeros(3), fx=400.0, fy=400.0,
                             height=H, width=W, uid=i)
        gt = render(opaque, cam0, pose=params.get_pose(i),
                    backend="pallas").render
        cams.append(cam0.replace(image=jnp.clip(gt, 0.0, 1.0)))
    stacked = stack_cameras(cams)
    opt = GaussianOptimizer(OptimizationConfig(optim_pose=True),
                            total_iterations=1000)
    state = opt.init(params)
    # burn in to a mid-training distribution (bench.py semantics)
    block = make_train_scan(opt, stacked, jnp.zeros(3), 0.2,
                            backend="pallas", chunk=512)
    it = 1
    for _ in range(3):
        vids = jnp.asarray(np.arange(it, it + 50) % 2, jnp.int32)
        its = jnp.arange(it, it + 50, dtype=jnp.int32)
        params, state, m = block(params, state, vids, its, 3)
        it += 50
    jax.block_until_ready(m["loss"])
    return opt, stacked, params, state, it


def measure(opt, stacked, params, state, it, iters):
    import jax
    import jax.numpy as jnp

    from instantsplat_tpu.pipelines.trainer import make_train_scan

    block = make_train_scan(opt, stacked, jnp.zeros(3), 0.2,
                            backend="pallas", chunk=512)
    vids = jnp.asarray(np.arange(it, it + iters) % 2, jnp.int32)
    its = jnp.arange(it, it + iters, dtype=jnp.int32)
    p, s, m = block(params, state, vids, its, 3)  # compile + warm
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    p, s, m = block(params, state, vids, its, 3)
    jax.block_until_ready(m["loss"])
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax

    from instantsplat_tpu.ops import rasterize_pallas as rp

    work = build_workload()
    base = (rp.STRIP_ROWS, rp.CHUNKS_PER_STEP, rp.BLOCK_ROWS)
    configs = [
        base,
        # At 5.6 ms/step the ~6 us/grid-step all-skip DMA floor matters:
        # fewer, bigger steps (CPS up) + finer termination granularity
        # (BLOCK_ROWS down) are the remaining knobs.
        (256, 16, 4),
        (256, 32, 4),
        (256, 8, 2),
        (256, 16, 2),
        (384, 16, 4),
        (384, 8, 4),
    ]
    seen = set()
    for strip, cps, br in configs:
        if (strip, cps, br) in seen:
            continue
        seen.add((strip, cps, br))
        rp.STRIP_ROWS, rp.CHUNKS_PER_STEP, rp.BLOCK_ROWS = strip, cps, br
        # jit caches key on the python constants via the traced call graph,
        # but make_train_scan builds a fresh jit each call, so new configs
        # recompile cleanly.
        try:
            dt = measure(*work, args.iters)
            mpix = 384 * 512 / dt / 1e6
            print(f"strip={strip:4d} cps={cps:2d} block_rows={br}: "
                  f"{dt * 1e3:7.2f} ms/iter  {mpix:6.2f} Mpix/s", flush=True)
        except Exception as e:  # Mosaic may reject a VMEM footprint
            print(f"strip={strip:4d} cps={cps:2d} block_rows={br}: "
                  f"FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
    rp.STRIP_ROWS, rp.CHUNKS_PER_STEP, rp.BLOCK_ROWS = base


if __name__ == "__main__":
    main()
