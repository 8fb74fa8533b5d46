"""Dense-vs-binned rasterizer regime benchmark (runs on the real chip).

Measures forward time for the dense and binned pallas backends on two
scenes: a termination-saturated one (mid-training joint-opt regime, where
the dense kernel's bitmap+early-termination shine) and a weak-opacity one
(nothing saturates; binned's sum-of-extents work model should win).

Chained-dependency timing per CLAUDE.md (unchained dispatch mis-measures
on axon).
"""

from __future__ import annotations

import time

import numpy as np

import sys as _sys
from pathlib import Path as _P
_sys.path.insert(0, str(_P(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from instantsplat_tpu.models.camera import Camera
    from instantsplat_tpu.models.gaussians import GaussianModel
    from instantsplat_tpu.render.driver import render

    N, H, W = 100_000, 384, 512
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    pts = jax.random.normal(ks[0], (N, 3)) * 1.5 + jnp.array([0.0, 0.0, 6.0])
    cols = jax.random.uniform(ks[1], (N, 3))
    poses = jnp.tile(jnp.array([1.0, 0, 0, 0, 0, 0, 0]), (1, 1))
    base = GaussianModel.create_from_pcd(pts, cols, cam_poses=poses,
                                         max_sh_degree=3)
    cam = Camera.create(np.eye(3), np.zeros(3), fx=400.0, fy=400.0,
                        height=H, width=W, uid=0)

    def bench(params, backend, iters=20):
        f = jax.jit(lambda p: render(p, cam, pose=p.get_pose(0),
                                     backend=backend).render)
        img = f(params)
        jax.block_until_ready(img)
        p = params
        t0 = time.perf_counter()
        for _ in range(iters):
            # chain: nudge means by a tiny function of the last image
            p = p.replace(xyz=p.xyz + 1e-12 * jnp.mean(img))
            img = f(p)
        jax.block_until_ready(img)
        return (time.perf_counter() - t0) / iters * 1e3

    for name, logit in [("saturated (logit +2)", 2.0),
                        ("weak (logit -3)", -3.0),
                        ("very weak (logit -5)", -5.0)]:
        params = base.replace(opacity=jnp.full_like(base.opacity, logit))
        td = bench(params, "pallas")
        tb = bench(params, "pallas-binned")
        print(f"{name}: dense {td:.1f} ms  binned {tb:.1f} ms  "
              f"(ratio {td / tb:.2f}x)")


if __name__ == "__main__":
    main()


def small_splats():
    import jax
    import jax.numpy as jnp

    from instantsplat_tpu.models.camera import Camera
    from instantsplat_tpu.models.gaussians import GaussianModel
    from instantsplat_tpu.render.driver import render
    import time

    N, H, W = 100_000, 384, 512
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    pts = jax.random.normal(ks[0], (N, 3)) * 1.5 + jnp.array([0.0, 0.0, 6.0])
    cols = jax.random.uniform(ks[1], (N, 3))
    poses = jnp.tile(jnp.array([1.0, 0, 0, 0, 0, 0, 0]), (1, 1))
    base = GaussianModel.create_from_pcd(pts, cols, cam_poses=poses,
                                         max_sh_degree=3)
    # shrink splats 4x (log-scale param)
    import numpy as _np
    base = base.replace(scaling=base.scaling + float(_np.log(0.25)))
    cam = Camera.create(np.eye(3), np.zeros(3), fx=400.0, fy=400.0,
                        height=H, width=W, uid=0)

    def bench(params, backend, iters=20):
        f = jax.jit(lambda p: render(p, cam, pose=p.get_pose(0),
                                     backend=backend).render)
        img = f(params)
        jax.block_until_ready(img)
        p = params
        t0 = time.perf_counter()
        for _ in range(iters):
            p = p.replace(xyz=p.xyz + 1e-12 * jnp.mean(img))
            img = f(p)
        jax.block_until_ready(img)
        return (time.perf_counter() - t0) / iters * 1e3

    for name, logit in [("small+saturated", 2.0), ("small+weak", -3.0)]:
        params = base.replace(opacity=jnp.full_like(base.opacity, logit))
        td = bench(params, "pallas")
        tb = bench(params, "pallas-binned")
        print(f"{name}: dense {td:.1f} ms  binned {tb:.1f} ms  "
              f"(ratio {td / tb:.2f}x)")
