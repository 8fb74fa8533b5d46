"""Train-step component split on the real chip (chained timing).

Reproduces bench.py's exact workload (384x512, N=100k, SH3, 150-iter
burn-in to a mid-training opacity/scale distribution), then measures:
render fwd, L1-only fwd+bwd, L1+SSIM fwd+bwd, and the full train step,
to locate the next optimization lever.
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from instantsplat_tpu.models.camera import Camera, stack_cameras
    from instantsplat_tpu.models.gaussians import GaussianModel
    from instantsplat_tpu.opt import GaussianOptimizer, OptimizationConfig
    from instantsplat_tpu.ops.losses import l1_loss
    from instantsplat_tpu.ops.ssim import ssim
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
    block = make_train_scan(opt, stacked, jnp.zeros(3), 0.2,
                            backend="pallas", chunk=512)
    it = 1
    for _ in range(150 // 50):
        vids = jnp.asarray(np.arange(it, it + 50) % 2, jnp.int32)
        its = jnp.arange(it, it + 50, dtype=jnp.int32)
        params, state, m = block(params, state, vids, its, 3)
        it += 50
    jax.block_until_ready(m["loss"])

    cam = cams[0].replace(image=stacked.image[0])
    gt = stacked.image[0]

    def timeit(f, p, iters=30):
        out = f(p)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            leaf = jax.tree_util.tree_leaves(out)[0]
            p = p.replace(xyz=p.xyz + 1e-12 * jnp.mean(leaf))
            out = f(p)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3

    fwd = jax.jit(lambda p: render(p, cam, pose=p.get_pose(0),
                                   backend="pallas").render)
    print(f"render fwd:        {timeit(fwd, params):7.2f} ms")

    def loss_fn(p):
        img = render(p, cam, pose=p.get_pose(0), backend="pallas").render
        return 0.8 * l1_loss(img, gt) + 0.2 * (1.0 - ssim(img, gt))

    def l1_only(p):
        img = render(p, cam, pose=p.get_pose(0), backend="pallas").render
        return l1_loss(img, gt)

    print(f"L1-only fwd+bwd:   {timeit(jax.jit(jax.grad(l1_only)), params):7.2f} ms")
    print(f"loss fwd+bwd:      {timeit(jax.jit(jax.grad(loss_fn)), params):7.2f} ms")

    @jax.jit
    def step(p, s):
        grads = jax.grad(loss_fn)(p)
        p2, s2 = opt.step(p, grads, s, 100)
        return p2

    print(f"full step:         {timeit(lambda p: step(p, state), params):7.2f} ms")


if __name__ == "__main__":
    main()
