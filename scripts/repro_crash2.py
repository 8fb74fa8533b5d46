"""Bisect the block-3 kernel fault: save state after iter 200, then run
iters 201-300 in shrinking sub-blocks to find the faulting dispatch size /
iteration."""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from instantsplat_tpu.data import scene as scene_io
from instantsplat_tpu.models.camera import stack_cameras
from instantsplat_tpu.models.gaussians import GaussianModel
from instantsplat_tpu.opt import GaussianOptimizer, OptimizationConfig
from instantsplat_tpu.pipelines.train_pipeline import confidence_to_lr
from instantsplat_tpu.pipelines.trainer import make_train_scan

SRC = "/tmp/is_e2e/data/plane"

info = scene_io.read_scene(SRC, 3, split="train")
cam_poses = GaussianModel.init_cam_poses_from_w2c(info.poses_w2c)
params = GaussianModel.create_from_pcd(
    info.points, info.colors, cam_poses=cam_poses, max_sh_degree=3)
conf = np.load(f"{SRC}/sparse_3/0/confidence_dsp.npy").reshape(-1)
confidence_lr = np.asarray(confidence_to_lr(conf)) \
    if len(conf) == params.num_points else None
opt_cfg = OptimizationConfig(optim_pose=True, pp_optimizer=True)
optimizer = GaussianOptimizer(opt_cfg, spatial_lr_scale=info.nerf_radius,
                              total_iterations=1000)
state = optimizer.init(params, confidence_lr=confidence_lr)
stacked = stack_cameras(info.cameras)

rng = np.random.RandomState(0)
queue = []


def next_views(k):
    global queue
    out = []
    for _ in range(k):
        if not queue:
            queue = list(rng.permutation(len(info.cameras)))
        out.append(queue.pop())
    return np.asarray(out, np.int32)


block100 = make_train_scan(optimizer, stacked, jnp.zeros(3), 0.2,
                           backend="pallas", chunk=256)

# blocks 1-2 (iters 1..200) with the K=100 program — known to survive
it = 1
for _ in range(2):
    vids = jnp.asarray(next_views(100))
    its = jnp.arange(it, it + 100, dtype=jnp.int32)
    t0 = time.perf_counter()
    params, state, m = block100(params, state, vids, its, 0)
    jax.block_until_ready(m["loss"])
    print(f"block {it}-{it+99}: loss={float(m['loss']):.5f} "
          f"wall={time.perf_counter()-t0:.1f}s", flush=True)
    it += 100

# iters 201-300 in sub-blocks of K (arg 1, default 25)
K = int(sys.argv[1]) if len(sys.argv) > 1 else 25
blockK = block100 if K == 100 else make_train_scan(
    optimizer, stacked, jnp.zeros(3), 0.2, backend="pallas", chunk=256)
vids300 = next_views(100)
for off in range(0, 100, K):
    vids = jnp.asarray(vids300[off:off + K])
    its = jnp.arange(it + off, it + off + K, dtype=jnp.int32)
    t0 = time.perf_counter()
    params, state, m = blockK(params, state, vids, its, 0)
    jax.block_until_ready(m["loss"])
    print(f"sub {it+off}-{it+off+K-1}: ok loss={float(m['loss']):.5f} "
          f"wall={time.perf_counter()-t0:.1f}s", flush=True)
print("done", flush=True)
