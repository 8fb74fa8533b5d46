import time, jax, jax.numpy as jnp, numpy as np
from instantsplat_tpu.models.camera import Camera, stack_cameras
from instantsplat_tpu.models.gaussians import GaussianModel
from instantsplat_tpu.opt import GaussianOptimizer, OptimizationConfig
from instantsplat_tpu.render.driver import render, prepare_sorted_splats
from instantsplat_tpu.ops.losses import photometric_loss
from instantsplat_tpu.ops import rasterize_pallas as rp

N_GAUSS, H, W = 100_000, 384, 512
ks = jax.random.split(jax.random.PRNGKey(0), 3)
pts = jax.random.normal(ks[0], (N_GAUSS, 3)) * 1.5 + jnp.array([0.0, 0.0, 6.0])
cols = jax.random.uniform(ks[1], (N_GAUSS, 3))
poses = jnp.tile(jnp.array([1.0, 0, 0, 0, 0, 0, 0]), (2, 1))
params = GaussianModel.create_from_pcd(pts, cols, cam_poses=poses, max_sh_degree=3)
gt = jax.random.uniform(ks[2], (H, W, 3))
cam = Camera.create(np.eye(3), np.zeros(3), fx=400.0, fy=400.0, height=H, width=W, uid=0, image=np.asarray(gt))

def timeit(nm, fn, *a):
    jax.block_until_ready(fn(*a))
    t0=time.time()
    for _ in range(10): out = fn(*a)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    print('%-28s %.1f ms' % (nm, (time.time()-t0)/10*1e3), flush=True)

pose = params.get_pose(0)
# 1. geometry front-end alone (activate+SH+project+sort)
front = jax.jit(lambda p: prepare_sorted_splats(p, pose, cam.fx, cam.fy, cam.cx, cam.cy, jnp.float32(1.0), 3, H, W)[0])
timeit('front-end fwd', front, params)
# 2. full render fwd
rend = jax.jit(lambda p: render(p, cam, pose=pose, backend='pallas').render)
timeit('render fwd', rend, params)
# 3. render fwd+bwd (no loss)
rb = jax.jit(jax.grad(lambda p: jnp.sum(render(p, cam, pose=pose, backend='pallas').render)))
timeit('render fwd+bwd', rb, params)
# 4. loss incl ssim fwd+bwd
lo = jax.jit(jax.grad(lambda p: photometric_loss(render(p, cam, pose=pose, backend='pallas').render, cam.image)[0]))
timeit('render+ssim fwd+bwd', lo, params)
# 5. front-end grad alone
fg = jax.jit(jax.grad(lambda p: sum(jnp.sum(x) for x in prepare_sorted_splats(p, pose, cam.fx, cam.fy, cam.cx, cam.cy, jnp.float32(1.0), 3, H, W)[0][:5])))
timeit('front-end fwd+bwd', fg, params)
# 6. ssim alone
from instantsplat_tpu.ops.ssim import ssim
sg = jax.jit(jax.grad(lambda a: ssim(a, gt)))
timeit('ssim fwd+bwd', sg, gt*0.9)
