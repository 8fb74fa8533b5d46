"""Component-level perf breakdown of the train step on the real TPU chip.

Reproduces bench.py's workload (100k Gaussians, 512x384, 150-iter burn-in to
a mid-training opacity distribution), then times each stage of the hot path
separately with chained dispatches (axon mis-measures unchained repeats —
CLAUDE.md timing notes):

  - dispatch floor (trivial jitted fn)
  - front-end fwd (activate+SH+project+sort+gather)
  - composite fwd (pallas kernel only, pre-sorted inputs)
  - composite fwd+bwd (kernel vjp only)
  - render fwd / render fwd+bwd (front-end + kernel)
  - ssim fwd+bwd, full loss fwd+bwd, Adam update, full train step

Also reports active (chunk x row-block) pair statistics derived from the
forward kernel's last-contributor output + the row bitmap, so kernel-side
skip behavior is visible without instrumenting the kernel.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def chain_time(fn, x0, iters=8, warmup=2, label=""):
    """Time fn: carry -> carry with chained dependencies. Returns ms/iter."""
    import jax

    print(f"[{time.strftime('%H:%M:%S')}] compiling {label}...", flush=True)
    x = x0
    for _ in range(warmup):
        x = fn(x)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    jax.block_until_ready(x)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"[{time.strftime('%H:%M:%S')}] {label}: {ms:.2f} ms", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from instantsplat_tpu.models.camera import Camera, stack_cameras
    from instantsplat_tpu.models.gaussians import GaussianModel
    from instantsplat_tpu.opt import GaussianOptimizer, OptimizationConfig
    from instantsplat_tpu.ops import rasterize, rasterize_pallas
    from instantsplat_tpu.ops.losses import photometric_loss
    from instantsplat_tpu.ops.ssim import ssim
    from instantsplat_tpu.pipelines.trainer import make_train_step
    from instantsplat_tpu.render.driver import prepare_sorted_splats, render

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
    cam = cams[0]

    opt = GaussianOptimizer(OptimizationConfig(optim_pose=True),
                            total_iterations=1000)
    state = opt.init(params)
    step = make_train_step(opt, stacked, jnp.zeros(3), 0.2, backend="pallas",
                           chunk=512)
    for it in range(1, 151):  # burn-in
        params, state, m = step(params, state, jnp.int32(it % 2),
                                jnp.int32(it), 3)
    jax.block_until_ready(m["loss"])
    print("burn-in done, loss=", float(m["loss"]))

    pose = params.get_pose(0)
    results = {}

    # --- dispatch floor ---
    triv = jax.jit(lambda x: x + 1.0)
    results["dispatch_floor"] = chain_time(triv, jnp.float32(0.0), iters=20, label="dispatch_floor")

    # --- front-end fwd ---
    @jax.jit
    def fe(c):
        p = params.replace(xyz=params.xyz + c * 1e-30)
        splats, _ = prepare_sorted_splats(
            p, pose, cam.fx, cam.fy, cam.cx, cam.cy, jnp.float32(1.0), 3,
            H, W)
        return sum(jnp.sum(s) for s in splats[:5]) * 1e-30

    results["frontend_fwd"] = chain_time(fe, jnp.float32(0.0), label="frontend_fwd")

    # pre-sorted splats for kernel-only timing
    splats = jax.jit(
        lambda: prepare_sorted_splats(params, pose, cam.fx, cam.fy, cam.cx,
                                      cam.cy, jnp.float32(1.0), 3, H, W)[0]
    )()
    splats = jax.tree.map(jnp.asarray, splats)
    m2, cn, lo, col, dep, val = splats

    # --- composite fwd (kernel only) ---
    @jax.jit
    def comp_fwd(c):
        out = rasterize_pallas.composite_tiles(
            m2 + c * 1e-30, cn, lo, col, dep, val, height=H, width=W,
            bg=jnp.zeros(3))
        return jnp.sum(out.rgb) * 1e-30

    results["composite_fwd"] = chain_time(comp_fwd, jnp.float32(0.0), label="composite_fwd")

    # --- composite fwd+bwd ---
    @jax.jit
    def comp_grad(c):
        def f(m2_, cn_, lo_, col_):
            out = rasterize_pallas.composite_tiles(
                m2_, cn_, lo_, col_, dep, val, height=H, width=W,
                bg=jnp.zeros(3))
            return jnp.sum(out.rgb) + jnp.sum(out.alpha)
        g = jax.grad(f, argnums=(0, 1, 2, 3))(m2 + c * 1e-30, cn, lo, col)
        return sum(jnp.sum(x) for x in g) * 1e-30

    results["composite_fwd_bwd"] = chain_time(comp_grad, jnp.float32(0.0), label="composite_fwd_bwd")

    # --- render fwd / fwd+bwd ---
    @jax.jit
    def rend_fwd(c):
        p = params.replace(xyz=params.xyz + c * 1e-30)
        out = render(p, cam, pose=pose, backend="pallas")
        return jnp.sum(out.render) * 1e-30

    results["render_fwd"] = chain_time(rend_fwd, jnp.float32(0.0), label="render_fwd")

    @jax.jit
    def rend_grad(c):
        def f(p):
            out = render(p, cam, pose=p.get_pose(0), backend="pallas")
            return jnp.sum(out.render)
        g = jax.grad(f)(params.replace(xyz=params.xyz + c * 1e-30))
        return jnp.sum(g.xyz) * 1e-30

    results["render_fwd_bwd"] = chain_time(rend_grad, jnp.float32(0.0), label="render_fwd_bwd")

    # --- ssim fwd+bwd ---
    img = jnp.asarray(cam.image)

    @jax.jit
    def ssim_grad(c):
        g = jax.grad(lambda a: ssim(a, img))(img + c * 1e-30)
        return jnp.sum(g) * 1e-30

    results["ssim_fwd_bwd"] = chain_time(ssim_grad, jnp.float32(0.0), label="ssim_fwd_bwd")

    # --- loss (render + photometric) fwd+bwd ---
    @jax.jit
    def loss_grad(c):
        def f(p):
            out = render(p, cam, pose=p.get_pose(0), backend="pallas")
            l, _ = photometric_loss(out.render, img, 0.2)
            return l
        g = jax.grad(f)(params.replace(xyz=params.xyz + c * 1e-30))
        return jnp.sum(g.xyz) * 1e-30

    results["loss_fwd_bwd"] = chain_time(loss_grad, jnp.float32(0.0), label="loss_fwd_bwd")

    # --- Adam update only ---
    grads = jax.jit(lambda: jax.grad(
        lambda p: photometric_loss(
            render(p, cam, pose=p.get_pose(0), backend="pallas").render,
            img, 0.2)[0])(params))()

    @jax.jit
    def adam_only(carry):
        p, s = carry
        p2, s2 = opt.step(p, grads, s, jnp.int32(500))
        return p2, s2

    results["adam_update"] = chain_time(adam_only, (params, state), label="adam_update")

    # --- full train step ---
    def full(carry):
        p, s = carry
        p, s, _ = step(p, s, jnp.int32(0), jnp.int32(500), 3)
        return p, s

    results["train_step"] = chain_time(full, (params, state), label="train_step")

    # --- active-pair statistics ---
    G = rasterize_pallas.G_CHUNK
    n = m2.shape[0]
    w_pad = rasterize_pallas._round_up(W, 128)
    n_pad, n_chunks, n_rb, n_pix = rasterize_pallas._strip_shapes(
        n, rasterize_pallas._round_up(H, rasterize_pallas.BLOCK_ROWS), w_pad)
    bits = jax.jit(rasterize_pallas._row_block_bitmap, static_argnums=(4, 5, 6))(
        m2, cn, lo, val, 0, rasterize_pallas._round_up(H, rasterize_pallas.BLOCK_ROWS), n_chunks)
    bits = np.asarray(bits)  # [n_rb, n_words]
    unpacked = ((bits[:, :, None] >> np.arange(32)[None, None, :]) & 1)
    unpacked = unpacked.reshape(n_rb, -1)[:, :n_chunks].astype(bool)

    fwd_j = jax.jit(rasterize_pallas._composite_strip_fwd,
                    static_argnums=(6, 7, 8, 9))
    _, res = fwd_j(
        m2, cn, lo, col, dep, val, 0,
        rasterize_pallas._round_up(H, rasterize_pallas.BLOCK_ROWS), w_pad,
        False)
    lc = np.asarray(res[3])  # [n_rb, n_pix]
    maxlc_rb = lc.max(axis=1)  # [n_rb]
    live_chunk = np.clip((maxlc_rb + 1 + G - 1) // G, 0, n_chunks)
    cidx = np.arange(n_chunks)[None, :]
    fwd_pairs = int((unpacked & (cidx <= live_chunk[:, None])).sum())
    total_pairs = n_rb * n_chunks
    bitmap_pairs = int(unpacked.sum())

    print("\n=== timings (ms) ===")
    for k, v in results.items():
        print(f"{k:>20}: {v:8.2f}")
    print("\n=== pair stats ===")
    print(f"n_chunks={n_chunks} n_rb={n_rb} total_pairs={total_pairs}")
    print(f"bitmap-admitted pairs: {bitmap_pairs} "
          f"({100*bitmap_pairs/total_pairs:.1f}%)")
    print(f"~live fwd pairs (bitmap & pre-termination): {fwd_pairs} "
          f"({100*fwd_pairs/total_pairs:.1f}%)")
    print(f"mean live chunks per rb: {live_chunk.mean():.1f} / {n_chunks}")


if __name__ == "__main__":
    main()
