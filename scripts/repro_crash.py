"""Isolate the data-dependent TPU kernel fault seen in bench_e2e training.

Reproduces the cli.train setup on the /tmp/is_e2e scene, steps in
10-iteration scan blocks, and prints parameter-health stats after each
block so the fault's trigger state is visible.
"""

import numpy as np

import jax
import jax.numpy as jnp

from instantsplat_tpu.data import scene as scene_io
from instantsplat_tpu.models.gaussians import GaussianModel
from instantsplat_tpu.opt import GaussianOptimizer, OptimizationConfig
from instantsplat_tpu.pipelines.train_pipeline import confidence_to_lr
from instantsplat_tpu.pipelines.trainer import make_train_scan

SRC = "/tmp/is_e2e/data/plane"
K = 100

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

from instantsplat_tpu.models.camera import stack_cameras

stacked = stack_cameras(info.cameras)
block = make_train_scan(optimizer, stacked, jnp.zeros(3), 0.2,
                        backend="pallas", chunk=256)

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


it = 1
while it <= 400:
    vids = jnp.asarray(next_views(K))
    its = jnp.arange(it, it + K, dtype=jnp.int32)
    params, state, m = block(params, state, vids, its, 0)
    sc = np.asarray(params.scaling)
    xyz = np.asarray(params.xyz)
    op = np.asarray(params.opacity)
    print(f"it {it:4d}-{it + K - 1}: loss={float(m['loss']):.5f} "
          f"scale[min={sc.min():.2f} max={sc.max():.2f} "
          f"nan={np.isnan(sc).sum()}] "
          f"xyz[max={np.abs(xyz).max():.3e} nan={np.isnan(xyz).sum()}] "
          f"op[max={op.max():.2f}]", flush=True)
    it += K
