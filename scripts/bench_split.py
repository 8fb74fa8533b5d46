"""Train-step component split on the real chip (scanned blocks).

Reproduces bench.py's exact workload (384x512, N=100k, SH3, 150-iter
burn-in to a mid-training opacity/scale distribution), then measures each
component as a 50-iteration lax.scan block per dispatch — single-dispatch
timing is unusable on the axon dev tunnel (per-dispatch latency ~tens of
ms swamps the ~ms compute; CLAUDE.md timing notes). Components:

  render fwd            forward only (packed front-end + dense kernel)
  front-end fwd         prepare_packed_splats only (no compositing)
  L1 fwd+bwd            render + L1 + full gradient
  loss fwd+bwd          render + L1+SSIM + full gradient
  full step             loss fwd+bwd + grouped Adam update (== bench.py)

Each scanned step chains on the previous step's output (params perturbed
by a zero-magnitude function of the result) so XLA cannot collapse or
overlap the iterations.
"""

from __future__ import annotations

import time

import numpy as np

import sys as _sys
from pathlib import Path as _P
_sys.path.insert(0, str(_P(__file__).resolve().parent.parent))

K = 50  # iterations per dispatch
BLOCKS = 4


def main():
    import jax
    import jax.numpy as jnp

    from instantsplat_tpu.models.camera import Camera, stack_cameras
    from instantsplat_tpu.models.gaussians import GaussianModel
    from instantsplat_tpu.opt import GaussianOptimizer, OptimizationConfig
    from instantsplat_tpu.ops.losses import l1_loss
    from instantsplat_tpu.ops.ssim import ssim
    from instantsplat_tpu.pipelines.trainer import make_train_scan
    from instantsplat_tpu.render.driver import prepare_packed_splats, render

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
    for _ in range(150 // K):
        vids = jnp.asarray(np.arange(it, it + K) % 2, jnp.int32)
        its = jnp.arange(it, it + K, dtype=jnp.int32)
        params, state, m = block(params, state, vids, its, 3)
        it += K
    jax.block_until_ready(m["loss"])

    cam = cams[0].replace(image=stacked.image[0])
    gt = stacked.image[0]

    def scan_block(per_iter):
        """Build a jitted K-iteration scan of per_iter(params) -> scalar."""

        @jax.jit
        def blockf(p):
            def body(pp, _):
                s = per_iter(pp)
                # negligible-but-unfoldable chain: next iter depends on this
                # result (0.0 * s gets constant-folded and the scan DCE'd)
                return pp.replace(xyz=pp.xyz + 1e-30 * s), s

            pp, ss = jax.lax.scan(body, p, None, length=K)
            return ss[-1]

        return blockf

    def timeit(blockf, p):
        out = blockf(p)  # compile + warm
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(BLOCKS):
            out = blockf(p)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / (BLOCKS * K) * 1e3

    def fwd_only(p):
        img = render(p, cam, pose=p.get_pose(0), backend="pallas").render
        return jnp.sum(img) * 1e-30

    def frontend_only(p):
        packed, _ = prepare_packed_splats(
            p, p.get_pose(0), cam.fx, cam.fy, cam.cx, cam.cy,
            jnp.float32(1.0), 3, H, W)
        # sum ALL columns: a single-column sum lets XLA DCE the rest of
        # the sort payload and the SH/color math
        return jnp.sum(packed) * 1e-30

    def _all_leaves(g):
        # consume EVERY gradient leaf: summing one leaf lets XLA DCE the
        # other params' backward paths (measured 3.6 ms of hidden work)
        return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g)) * 1e-30

    def l1_grad(p):
        def f(pp):
            img = render(pp, cam, pose=pp.get_pose(0),
                         backend="pallas").render
            return l1_loss(img, gt)

        return _all_leaves(jax.grad(f)(p))

    def loss_grad(p):
        def f(pp):
            img = render(pp, cam, pose=pp.get_pose(0),
                         backend="pallas").render
            return 0.8 * l1_loss(img, gt) + 0.2 * (1.0 - ssim(img, gt))

        return _all_leaves(jax.grad(f)(p))

    def sort_grad(p):
        # the depth-sort front-end in isolation: sort_payload fwd + one-sort
        # bwd at the production payload width (key + 9 columns)
        from instantsplat_tpu.render.driver import sort_payload

        def f(pp):
            c = [pp.xyz[:, i % 3] * (1.0 + 0.01 * i) for i in range(9)]
            s = sort_payload(pp.xyz[:, 2], *c)
            return sum(jnp.sum(x) for x in s)

        return jax.grad(f)(p).xyz.sum() * 1e-30

    def kernel_grad(p):
        # compositing kernel fwd+bwd only: stop-grad front-end, grad w.r.t.
        # the packed splat array through the pallas custom_vjp
        from instantsplat_tpu.ops import rasterize_pallas

        packed, _ = prepare_packed_splats(
            p, p.get_pose(0), cam.fx, cam.fy, cam.cx, cam.cy,
            jnp.float32(1.0), 3, H, W)
        packed = jax.lax.stop_gradient(packed)

        def f(pk):
            out = rasterize_pallas.composite_tiles_packed(
                pk, height=H, width=W, bg=jnp.zeros(3))
            return jnp.sum(out.rgb)

        return jnp.sum(jax.grad(f)(packed)) * 1e-30

    print(f"front-end fwd:   {timeit(scan_block(frontend_only), params):7.2f} ms")
    print(f"sort fwd+bwd:    {timeit(scan_block(sort_grad), params):7.2f} ms")
    print(f"render fwd:      {timeit(scan_block(fwd_only), params):7.2f} ms")
    print(f"kernel fwd+bwd:  {timeit(scan_block(kernel_grad), params):7.2f} ms")
    print(f"L1 fwd+bwd:      {timeit(scan_block(l1_grad), params):7.2f} ms")
    print(f"loss fwd+bwd:    {timeit(scan_block(loss_grad), params):7.2f} ms")

    # full step: the production scan block itself
    vids = jnp.asarray(np.arange(it, it + K) % 2, jnp.int32)
    its = jnp.arange(it, it + K, dtype=jnp.int32)
    p2, s2, m2 = block(params, state, vids, its, 3)
    jax.block_until_ready(m2["loss"])
    t0 = time.perf_counter()
    p3, s3 = params, state
    for _ in range(BLOCKS):
        p3, s3, m3 = block(p3, s3, vids, its, 3)
    jax.block_until_ready(m3["loss"])
    dt = (time.perf_counter() - t0) / (BLOCKS * K) * 1e3
    print(f"full step:       {dt:7.2f} ms")


if __name__ == "__main__":
    main()
