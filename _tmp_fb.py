import time, jax, jax.numpy as jnp, numpy as np
log = open('/tmp/fb_out.txt', 'w')
def P(*a): print(*a, file=log, flush=True)
from instantsplat_tpu.models.camera import Camera, stack_cameras
from instantsplat_tpu.models.gaussians import GaussianModel
from instantsplat_tpu.opt import GaussianOptimizer, OptimizationConfig
from instantsplat_tpu.pipelines.trainer import make_train_step
from instantsplat_tpu.render.driver import render
from instantsplat_tpu.ops.losses import photometric_loss

N, H, W = 100_000, 384, 512
ks = jax.random.split(jax.random.PRNGKey(0), 3)
pts = jax.random.normal(ks[0], (N, 3)) * 1.5 + jnp.array([0.0, 0.0, 6.0])
cols = jax.random.uniform(ks[1], (N, 3))
poses = jnp.tile(jnp.array([1.0, 0, 0, 0, 0, 0, 0]), (2, 1))
params = GaussianModel.create_from_pcd(pts, cols, cam_poses=poses)
opaque = params.replace(opacity=jnp.full_like(params.opacity, 2.0))
cams = []
for i in range(2):
    cam0 = Camera.create(np.eye(3), np.zeros(3), fx=400.0, fy=400.0, height=H, width=W, uid=i)
    gt = render(opaque, cam0, pose=params.get_pose(i), backend='pallas').render
    cams.append(cam0.replace(image=jnp.clip(gt, 0, 1)))
stacked = stack_cameras(cams)
opt = GaussianOptimizer(OptimizationConfig(optim_pose=True), total_iterations=1000)
state = opt.init(params)
step = make_train_step(opt, stacked, jnp.zeros(3), 0.2, backend='pallas', chunk=512)
for it in range(1, 151):
    params, state, m = step(params, state, jnp.int32(it % 2), jnp.int32(it), 3)
jax.block_until_ready(m['loss'])
P('burned in; psnr', float(m['psnr']))
cam = cams[0]
pose = params.get_pose(0)
# chained fwd
f = jax.jit(lambda p, x: render(p.replace(xyz=p.xyz + 0*x), cam, pose=pose, backend='pallas').render.mean())
x = jnp.float32(0.)
jax.block_until_ready(f(params, x))
t0=time.time()
for _ in range(20): x = f(params, x)
float(x); P('render fwd: %.1f ms' % ((time.time()-t0)/20*1e3))
# chained fwd+bwd
def loss(p):
    out = render(p, cam, pose=pose, backend='pallas').render
    return photometric_loss(out, cam.image)[0]
g = jax.jit(lambda p, x: jax.grad(loss)(p.replace(xyz=p.xyz + 0*x)).xyz.mean())
x = jnp.float32(0.)
jax.block_until_ready(g(params, x))
t0=time.time()
for _ in range(20): x = g(params, x)
float(x); P('render+ssim fwd+bwd: %.1f ms' % ((time.time()-t0)/20*1e3))
log.close()
