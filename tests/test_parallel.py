"""Multi-chip sharding tests on the 8-device CPU mesh: the pixel-sharded
render and train step must match the single-device path exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from instantsplat_tpu.models.camera import Camera, stack_cameras
from instantsplat_tpu.models.gaussians import GaussianModel
from instantsplat_tpu.opt import GaussianOptimizer, OptimizationConfig
from instantsplat_tpu.parallel import make_mesh, make_sharded_train_step, sharded_render
from instantsplat_tpu.ops.losses import photometric_loss
from instantsplat_tpu.render import render


def make_scene(n=60, size=40, views=2, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 2)
    pts = jax.random.normal(ks[0], (n, 3)) * 0.5 + jnp.array([0.0, 0.0, 4.0])
    cols = jax.random.uniform(ks[1], (n, 3))
    poses = jnp.tile(jnp.array([1.0, 0, 0, 0, 0, 0, 0]), (views, 1))
    g = GaussianModel.create_from_pcd(pts, cols, cam_poses=poses, max_sh_degree=1)
    cams = [
        Camera.create(np.eye(3), np.zeros(3), fx=50.0, fy=50.0, height=size,
                      width=size, uid=i)
        for i in range(views)
    ]
    return g, cams


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8


def test_sharded_render_matches_single_device():
    g, cams = make_scene()
    mesh = make_mesh()
    ref = render(g, cams[0], chunk=64)
    rgb, alpha, depth = sharded_render(g, cams[0], mesh, chunk=64)
    np.testing.assert_allclose(rgb, ref.render, atol=1e-5)
    np.testing.assert_allclose(alpha, ref.alpha, atol=1e-5)


def test_sharded_render_nondivisible_rows():
    g, cams = make_scene(size=42)  # 42 rows over 8 devices -> padded to 48
    mesh = make_mesh()
    ref = render(g, cams[0], chunk=64)
    rgb, _, _ = sharded_render(g, cams[0], mesh, chunk=64)
    assert rgb.shape == (42, 42, 3)
    np.testing.assert_allclose(rgb, ref.render, atol=1e-5)


def test_sharded_gradients_match_single_device():
    g, cams = make_scene(seed=3)
    mesh = make_mesh()
    target = jax.random.uniform(jax.random.PRNGKey(5), (40, 40, 3))

    def loss_single(p):
        out = render(p, cams[0], pose=p.get_pose(0), chunk=64)
        return photometric_loss(out.render, target)[0]

    def loss_sharded(p):
        rgb, _, _ = sharded_render(p, cams[0], mesh, pose=p.get_pose(0), chunk=64)
        return photometric_loss(rgb, target)[0]

    g1 = jax.grad(loss_single)(g)
    g2 = jax.grad(loss_sharded)(g)
    for name in ("xyz", "scaling", "rotation", "opacity", "features_dc", "cam_poses"):
        np.testing.assert_allclose(
            np.asarray(getattr(g1, name)),
            np.asarray(getattr(g2, name)),
            atol=1e-5,
            err_msg=name,
        )


def test_sharded_train_step_runs_and_reduces_loss():
    g, cams = make_scene(seed=4, views=3)
    mesh = make_mesh()
    # synth GT: render the scene, then perturb params and recover
    cams = [c.replace(image=render(g, c, chunk=64).render) for c in cams]
    stacked = stack_cameras(cams)
    init = g.replace(
        features_dc=g.features_dc + 0.3 * jax.random.normal(jax.random.PRNGKey(1), g.features_dc.shape)
    )
    opt = GaussianOptimizer(OptimizationConfig(optim_pose=True), total_iterations=50)
    state = opt.init(init)
    step = make_sharded_train_step(
        opt, stacked, jnp.zeros(3), 0.2, mesh, chunk=64
    )
    params = init
    losses = []
    for it in range(1, 21):
        params, state, m = step(params, state, jnp.int32(it % 3), jnp.int32(it), 0)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_sharded_render_pallas_backend_matches_oracle():
    """Per-chip pallas kernels inside shard_map == oracle sharded render."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from instantsplat_tpu.models.camera import Camera
    from instantsplat_tpu.models.gaussians import GaussianModel
    from instantsplat_tpu.parallel import make_mesh
    from instantsplat_tpu.parallel.sharding import sharded_render

    ks = jax.random.split(jax.random.PRNGKey(5), 2)
    pts = jax.random.normal(ks[0], (300, 3)) * 0.5 + jnp.array([0.0, 0.0, 4.0])
    cols = jax.random.uniform(ks[1], (300, 3))
    poses = jnp.tile(jnp.array([1.0, 0, 0, 0, 0, 0, 0]), (1, 1))
    params = GaussianModel.create_from_pcd(pts, cols, cam_poses=poses)
    cam = Camera.create(np.eye(3), np.zeros(3), fx=40.0, fy=40.0,
                        height=32, width=32)
    mesh = make_mesh(4)
    rgb_o, a_o, d_o = sharded_render(params, cam, mesh, backend="oracle")
    rgb_p, a_p, d_p = sharded_render(params, cam, mesh, backend="pallas")
    np.testing.assert_allclose(np.asarray(rgb_p), np.asarray(rgb_o),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(a_p), np.asarray(a_o), atol=2e-5)


def test_aligner_mesh_sharded_matches_single():
    """Edge-sharded alignment == unsharded alignment (same jitted math)."""
    import sys

    import numpy as np

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_aligner import _synthetic_scene

    from instantsplat_tpu.init import GlobalAligner
    from instantsplat_tpu.parallel import make_mesh

    c2w_gt, _, preds = _synthetic_scene(n_views=3)  # 6 edges
    a1 = GlobalAligner(preds)
    a1.init_mst(focal_avg=True)
    l1 = a1.align(niter=40)
    a2 = GlobalAligner(preds)
    a2.init_mst(focal_avg=True)
    mesh = make_mesh(2)  # 6 edges % 2 == 0
    l2 = a2.align(niter=40, mesh=mesh)
    assert abs(l1 - l2) < 1e-5, (l1, l2)
    np.testing.assert_allclose(a1.get_im_poses(), a2.get_im_poses(),
                               atol=1e-4)


def test_runtime_initialize_noop_single_process(monkeypatch):
    from instantsplat_tpu.parallel import initialize_runtime

    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert initialize_runtime() is False  # single-process: no-op


def test_mesh_nd_2d_collectives():
    """2-D ("data","rows") mesh: psum over each axis independently."""
    from functools import partial

    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from instantsplat_tpu.parallel import make_mesh_nd

    mesh = make_mesh_nd((4, 2), ("data", "rows"))
    assert mesh.shape == {"data": 4, "rows": 2}

    x = jnp.arange(8.0).reshape(4, 2)

    @partial(shard_map, mesh=mesh, in_specs=P("data", "rows"),
             out_specs=P("data", "rows"))
    def f(blk):
        return (jax.lax.psum(blk, "rows")
                + jax.lax.psum(blk, "data"))

    out = f(x)
    expected = x.sum(1, keepdims=True) + x.sum(0, keepdims=True)
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_mesh_nd_too_many_devices():
    import pytest

    from instantsplat_tpu.parallel import make_mesh_nd

    with pytest.raises(ValueError, match="needs 16 devices"):
        make_mesh_nd((4, 4), ("data", "rows"))


def test_sharded_pallas_train_step_matches_single_device():
    """Sharded train step with the production pallas backend == the
    single-device pallas train step (VERDICT r1 item 2): identical params,
    metrics, and pose grads after several updates."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from instantsplat_tpu.models.camera import Camera, stack_cameras
    from instantsplat_tpu.models.gaussians import GaussianModel
    from instantsplat_tpu.opt import GaussianOptimizer, OptimizationConfig
    from instantsplat_tpu.parallel import make_mesh, make_sharded_train_step
    from instantsplat_tpu.pipelines.trainer import make_train_step
    from instantsplat_tpu.render import render

    ks = jax.random.split(jax.random.PRNGKey(7), 2)
    pts = jax.random.normal(ks[0], (250, 3)) * 0.5 + jnp.array([0.0, 0.0, 4.0])
    cols = jax.random.uniform(ks[1], (250, 3))
    poses = jnp.tile(jnp.array([1.0, 0, 0, 0, 0, 0, 0]), (2, 1))
    g = GaussianModel.create_from_pcd(pts, cols, cam_poses=poses)
    cams = [
        Camera.create(np.eye(3), np.zeros(3), fx=40.0, fy=40.0,
                      height=32, width=32, uid=i)
        for i in range(2)
    ]
    cams = [c.replace(image=render(g, c, chunk=64, backend="pallas").render)
            for c in cams]
    stacked = stack_cameras(cams)
    init = g.replace(
        features_dc=g.features_dc
        + 0.25 * jax.random.normal(jax.random.PRNGKey(3), g.features_dc.shape)
    )
    opt = GaussianOptimizer(OptimizationConfig(optim_pose=True),
                            total_iterations=20)
    mesh = make_mesh(4)
    step_sh = make_sharded_train_step(opt, stacked, jnp.zeros(3), 0.2, mesh,
                                      backend="pallas")
    step_1d = make_train_step(opt, stacked, jnp.zeros(3), 0.2,
                              backend="pallas", chunk=64)

    p_sh, s_sh = init, opt.init(init)
    p_1d, s_1d = init, opt.init(init)
    for it in range(1, 6):
        p_sh, s_sh, m_sh = step_sh(p_sh, s_sh, jnp.int32(it % 2),
                                   jnp.int32(it), 0)
        p_1d, s_1d, m_1d = step_1d(p_1d, s_1d, jnp.int32(it % 2),
                                   jnp.int32(it), 0)
    np.testing.assert_allclose(float(m_sh["loss"]), float(m_1d["loss"]),
                               rtol=1e-4)
    for name in ("xyz", "features_dc", "opacity", "cam_poses"):
        a = np.asarray(getattr(p_sh, name))
        b = np.asarray(getattr(p_1d, name))
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a / scale, b / scale, atol=5e-4,
                                   err_msg=f"sharded != single: {name}")


def test_gaussian_sharded_render_matches_single_device():
    """Depth-slice (Gaussian-parallel) rendering: each chip composites a
    contiguous depth slice over the full image; the over-operator merge
    must reproduce the single-device image up to the termination-latch
    tolerance (post-termination splats carry weight < 1e-4 instead of
    exactly 0 — see gaussian_sharded_render docstring)."""
    from instantsplat_tpu.parallel import gaussian_sharded_render

    g, cams = make_scene(n=100, seed=7)
    mesh = make_mesh()
    ref = render(g, cams[0], chunk=64, backend="pallas")
    rgb, alpha, depth = gaussian_sharded_render(g, cams[0], mesh)
    assert rgb.shape == ref.render.shape
    np.testing.assert_allclose(rgb, ref.render, atol=3e-4)
    np.testing.assert_allclose(alpha, ref.alpha, atol=3e-4)
    np.testing.assert_allclose(depth, ref.depth, atol=3e-3)


def test_gaussian_sharded_render_opaque_termination():
    """An opaque scene saturates transmittance early: the cross-slice
    prefix weighting must kill back-slice contributions the same way the
    single-device latch does."""
    from instantsplat_tpu.parallel import gaussian_sharded_render

    g, cams = make_scene(n=120, seed=11)
    g = g.replace(opacity=jnp.full_like(g.opacity, 4.0))  # sigmoid ~ 0.98
    mesh = make_mesh()
    ref = render(g, cams[0], chunk=64, backend="pallas")
    rgb, alpha, _ = gaussian_sharded_render(g, cams[0], mesh)
    # tolerance = the latch-truncation bound (incident T at the firing
    # splat, up to ~1e-2 — see gaussian_sharded_render docstring); the
    # sliced image is the more-converged of the two
    np.testing.assert_allclose(rgb, ref.render, atol=5e-3)
    np.testing.assert_allclose(alpha, ref.alpha, atol=5e-3)


def test_gaussian_sharded_gradients_match_single_device():
    from instantsplat_tpu.parallel import gaussian_sharded_render

    g, cams = make_scene(n=100, seed=13)
    mesh = make_mesh()
    target = jax.random.uniform(jax.random.PRNGKey(5), (40, 40, 3))

    def loss_single(p):
        out = render(p, cams[0], pose=p.get_pose(0), chunk=64,
                     backend="pallas")
        return photometric_loss(out.render, target)[0]

    def loss_sharded(p):
        rgb, _, _ = gaussian_sharded_render(p, cams[0], mesh,
                                            pose=p.get_pose(0))
        return photometric_loss(rgb, target)[0]

    g1 = jax.grad(loss_single)(g)
    g2 = jax.grad(loss_sharded)(g)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(a, b, atol=2e-4)


def test_gaussian_sharded_train_step_matches_single_device():
    """shard_axis='gaussians' through the full train step: params after
    one step match the single-device pallas step."""
    from instantsplat_tpu.pipelines.trainer import make_train_step

    g, cams = make_scene(n=96, seed=17)
    gt = jax.random.uniform(jax.random.PRNGKey(2), (40, 40, 3))
    cams = [c.replace(image=gt) for c in cams]
    stacked = stack_cameras(cams)
    mesh = make_mesh()
    opt = GaussianOptimizer(OptimizationConfig(optim_pose=True),
                            total_iterations=100)
    state = opt.init(g)
    bg = jnp.zeros(3)

    step_s = make_train_step(opt, stacked, bg, 0.2, backend="pallas",
                             chunk=64)
    step_m = make_sharded_train_step(opt, stacked, bg, 0.2, mesh,
                                     shard_axis="gaussians")
    p1, s1, m1 = step_s(g, state, jnp.int32(0), jnp.int32(1), 1)
    p2, s2, m2 = step_m(g, state, jnp.int32(0), jnp.int32(1), 1)
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-4
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(a, b, atol=2e-4)


def test_hybrid_sharded_render_matches_single_device():
    """2-D mesh (pixel rows x depth slices): the composed merge must
    reproduce the single-device image within the latch tolerance, on both
    a transparent and an opaque scene."""
    from instantsplat_tpu.parallel import hybrid_sharded_render
    from instantsplat_tpu.parallel.runtime import make_mesh_nd

    g, cams = make_scene(n=100, seed=19)
    mesh = make_mesh_nd((4, 2), ("pix", "gauss"))
    ref = render(g, cams[0], chunk=64, backend="pallas")
    rgb, alpha, depth = hybrid_sharded_render(g, cams[0], mesh)
    assert rgb.shape == ref.render.shape
    np.testing.assert_allclose(rgb, ref.render, atol=3e-4)
    np.testing.assert_allclose(alpha, ref.alpha, atol=3e-4)

    opaque = g.replace(opacity=jnp.full_like(g.opacity, 4.0))
    ref_o = render(opaque, cams[0], chunk=64, backend="pallas")
    rgb_o, _, _ = hybrid_sharded_render(opaque, cams[0], mesh)
    np.testing.assert_allclose(rgb_o, ref_o.render, atol=5e-3)


def test_hybrid_sharded_gradients_match_single_device():
    from instantsplat_tpu.parallel import hybrid_sharded_render
    from instantsplat_tpu.parallel.runtime import make_mesh_nd

    g, cams = make_scene(n=80, seed=23)
    mesh = make_mesh_nd((2, 4), ("pix", "gauss"))
    target = jax.random.uniform(jax.random.PRNGKey(5), (40, 40, 3))

    def loss_single(p):
        out = render(p, cams[0], pose=p.get_pose(0), chunk=64,
                     backend="pallas")
        return photometric_loss(out.render, target)[0]

    def loss_hybrid(p):
        rgb, _, _ = hybrid_sharded_render(p, cams[0], mesh,
                                          pose=p.get_pose(0))
        return photometric_loss(rgb, target)[0]

    g1 = jax.grad(loss_single)(g)
    g2 = jax.grad(loss_hybrid)(g)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(a, b, atol=2e-4)


def test_aligner_area_sharded_matches_single():
    """When the edge count doesn't divide the mesh, the aligner shards the
    AREA (pixel) axis of the stacked edge tensors instead of falling back
    to replicated — results must match the unsharded run exactly."""
    import sys

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_aligner import _synthetic_scene

    from instantsplat_tpu.init import GlobalAligner

    c2w_gt, _, preds = _synthetic_scene(n_views=3)  # 6 edges, area 768
    a1 = GlobalAligner(preds)
    a1.init_mst(focal_avg=True)
    l1 = a1.align(niter=40)
    a2 = GlobalAligner(preds)
    a2.init_mst(focal_avg=True)
    mesh = make_mesh(4)  # 6 % 4 != 0, 768 % 4 == 0 -> area sharding
    l2 = a2.align(niter=40, mesh=mesh)
    assert abs(l1 - l2) < 1e-5, (l1, l2)
    np.testing.assert_allclose(a1.get_im_poses(), a2.get_im_poses(),
                               atol=1e-4)


def test_tensor_parallel_mast3r_matches_single_device():
    """Megatron-style TP placement of the pointmap transformer: jit with
    'model'-axis-sharded params must reproduce the replicated forward
    exactly (XLA inserts the all-reduces; parallel/tp.py)."""
    from instantsplat_tpu.models import mast3r
    from instantsplat_tpu.parallel import make_mesh_nd
    from instantsplat_tpu.parallel.tp import shard_params_tp

    cfg = mast3r.MASt3RConfig(
        enc_embed_dim=64, enc_depth=2, enc_num_heads=2, dec_embed_dim=48,
        dec_depth=2, dec_num_heads=2, dpt_layer_dims=(8, 16, 24, 32),
        dpt_feature_dim=16, dpt_last_dim=8)
    params = mast3r.init_params(cfg, seed=0)
    rng = np.random.default_rng(3)
    img1 = rng.random((2, 32, 48, 3)).astype(np.float32)
    img2 = rng.random((2, 32, 48, 3)).astype(np.float32)

    fwd = jax.jit(lambda p: mast3r.forward_pair(p, cfg, img1, img2))
    r1_ref, r2_ref = fwd(params)

    mesh = make_mesh_nd((2, 4), ("data", "model"))
    tp_params = shard_params_tp(params, mesh)
    # sharding took effect on at least the big matrices
    qkv = tp_params["enc_blocks"][0]["attn"]["qkv"]["w"]
    assert "model" in str(qkv.sharding.spec)
    r1_tp, r2_tp = fwd(tp_params)
    # different matmul partitionings reassociate f32 sums: compare at
    # ~1e-5 of each tensor's own scale
    for ref, tp in ((r1_ref, r1_tp), (r2_ref, r2_tp)):
        for k in ("pts3d", "conf", "desc"):
            a, b = np.asarray(tp[k]), np.asarray(ref[k])
            tol = 2e-5 * max(np.abs(b).max(), 1.0)
            np.testing.assert_allclose(a, b, atol=tol, err_msg=k)


def test_fsdp_pretrain_step_matches_replicated():
    """FSDP placement (params/moments sharded over the data axis) must
    produce the same training trajectory as the replicated DP step."""
    from instantsplat_tpu.models import mast3r
    from instantsplat_tpu.train_dust3r.trainer import (
        make_dp_train_step,
        synthetic_batch,
    )

    cfg = mast3r.MASt3RConfig(
        enc_embed_dim=32, enc_depth=1, enc_num_heads=2, dec_embed_dim=32,
        dec_depth=1, dec_num_heads=2, dpt_layer_dims=(8, 8, 8, 8),
        dpt_feature_dim=8, dpt_last_dim=4, patch_size=16)
    params = mast3r.init_params(cfg, seed=0)
    mesh = make_mesh(4)
    batch = synthetic_batch(cfg, batch=4, h=16, w=16, seed=1)
    kw = dict(warmup_steps=1, total_steps=4)

    init_r, step_r, shard_r = make_dp_train_step(cfg, mesh=mesh, **kw)
    init_f, step_f, shard_f = make_dp_train_step(cfg, mesh=mesh, fsdp=True,
                                                 **kw)
    s_r, s_f = init_r(params), init_f(params)
    # the big weights actually got sharded
    qkv = s_f["params"]["enc_blocks"][0]["attn"]["qkv"]["w"]
    assert "data" in str(qkv.sharding.spec)
    for _ in range(2):
        s_r, m_r = step_r(s_r, shard_r(batch))
        s_f, m_f = step_f(s_f, shard_f(batch))
    assert abs(float(m_r["loss"]) - float(m_f["loss"])) < 1e-5
    for a, b in zip(jax.tree.leaves(s_r["params"]),
                    jax.tree.leaves(s_f["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fsdp_checkpoint_resume_keeps_sharding(tmp_path):
    """Resume must re-place loaded leaves with the template's sharding —
    an FSDP run that resumed as replicated would silently lose the ZeRO-3
    memory saving (and OOM at the scale FSDP exists for)."""
    from instantsplat_tpu.models import mast3r
    from instantsplat_tpu.train_dust3r.trainer import (
        load_pretrain_checkpoint,
        make_dp_train_step,
        save_pretrain_checkpoint,
    )

    cfg = mast3r.MASt3RConfig(
        enc_embed_dim=32, enc_depth=1, enc_num_heads=2, dec_embed_dim=32,
        dec_depth=1, dec_num_heads=2, dpt_layer_dims=(8, 8, 8, 8),
        dpt_feature_dim=8, dpt_last_dim=4, patch_size=16)
    mesh = make_mesh(4)
    init_f, _, _ = make_dp_train_step(cfg, mesh=mesh, fsdp=True)
    state = init_f(mast3r.init_params(cfg, seed=0))
    qkv_spec = str(
        state["params"]["enc_blocks"][0]["attn"]["qkv"]["w"].sharding.spec)
    assert "data" in qkv_spec
    save_pretrain_checkpoint(tmp_path / "ckpt.npz", state)
    loaded = load_pretrain_checkpoint(tmp_path / "ckpt.npz", state)
    got = loaded["params"]["enc_blocks"][0]["attn"]["qkv"]["w"].sharding
    assert "data" in str(getattr(got, "spec", got)), got


def test_train_joint_sharded_matches_single():
    """PIPELINE-level multi-chip (VERDICT r3 item 1): train_joint's
    governed scan loop with TrainerConfig.n_devices set — the exact path
    `cli.train --n_devices N` takes — produces the same parameters as the
    single-device loop."""
    from instantsplat_tpu.pipelines.trainer import TrainerConfig, train_joint
    from instantsplat_tpu.render import render as _render

    g, cams = make_scene(n=200, size=32, views=2, seed=11)
    cams = [c.replace(image=_render(g, c, chunk=64, backend="pallas").render)
            for c in cams]
    init = g.replace(
        features_dc=g.features_dc
        + 0.25 * jax.random.normal(jax.random.PRNGKey(4), g.features_dc.shape)
    )
    opt_cfg = OptimizationConfig(optim_pose=True)
    kw = dict(iterations=8, backend="pallas", chunk=64, log_every=4, seed=5)

    p_1d, _, h_1d = train_joint(
        init, cams, opt_cfg=opt_cfg, trainer_cfg=TrainerConfig(**kw))
    p_sh, _, h_sh = train_joint(
        init, cams, opt_cfg=opt_cfg,
        trainer_cfg=TrainerConfig(**kw, n_devices=4))

    np.testing.assert_allclose(h_sh[-1][1]["loss"], h_1d[-1][1]["loss"],
                               rtol=1e-4)
    for name in ("xyz", "features_dc", "opacity", "cam_poses"):
        a = np.asarray(getattr(p_sh, name))
        b = np.asarray(getattr(p_1d, name))
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a / scale, b / scale, atol=5e-4,
                                   err_msg=f"sharded != single: {name}")


def test_train_joint_sharded_gaussian_axis_runs():
    """train_joint with shard_axis='gaussians' (depth-sliced splats) runs
    and reduces the loss."""
    from instantsplat_tpu.pipelines.trainer import TrainerConfig, train_joint
    from instantsplat_tpu.render import render as _render

    g, cams = make_scene(n=128, size=32, views=2, seed=12)
    cams = [c.replace(image=_render(g, c, chunk=64, backend="pallas").render)
            for c in cams]
    init = g.replace(
        features_dc=g.features_dc
        + 0.3 * jax.random.normal(jax.random.PRNGKey(6), g.features_dc.shape)
    )
    _, _, hist = train_joint(
        init, cams, opt_cfg=OptimizationConfig(optim_pose=True),
        trainer_cfg=TrainerConfig(iterations=8, backend="pallas", chunk=64,
                                  log_every=4, n_devices=4,
                                  shard_axis="gaussians"))
    assert hist[-1][1]["loss"] < hist[0][1]["loss"]


def test_refine_poses_sharded_matches_sequential(tmp_path):
    """Views-DP test-time pose refinement (render.py:99-186 semantics,
    cli.render --n_devices): the sharded per-view refinements equal the
    sequential refiner's output."""
    from instantsplat_tpu.pipelines.render_pipeline import (
        make_pose_refiner,
        refine_poses_sharded,
    )
    from instantsplat_tpu.render import render as _render

    g, cams = make_scene(n=150, size=32, views=1, seed=21)
    cam = cams[0]
    # GT views rendered from perturbed poses; refinement should pull back
    rng = np.random.RandomState(3)
    v = 6
    poses0, gts = [], []
    for k in range(v):
        true_pose = jnp.asarray(
            np.array([1, 0, 0, 0, 0, 0, 0]) +
            0.02 * rng.randn(7), jnp.float32)
        gts.append(_render(g, cam, pose=true_pose, chunk=64,
                           backend="pallas").render)
        poses0.append(true_pose + 0.01 * jnp.asarray(rng.randn(7),
                                                     jnp.float32))
    poses0 = jnp.stack(poses0)
    gts = jnp.stack(gts)

    mesh = make_mesh(4)
    ref_sh, loss_sh = refine_poses_sharded(
        g, cam, poses0, gts, mesh, backend="pallas", num_iter=20)

    refiner = make_pose_refiner(g, cam, backend="pallas", num_iter=20)
    for k in range(v):
        bp, bl = refiner(poses0[k], gts[k])
        np.testing.assert_allclose(ref_sh[k], np.asarray(bp), atol=1e-5,
                                   err_msg=f"view {k}")
        np.testing.assert_allclose(loss_sh[k], float(bl), rtol=1e-4)


def test_refine_poses_batched_no_mesh_matches_sequential():
    """The batched single-device refinement path (lax.map over views, one
    dispatch per block — the default for same-shape test sets) equals the
    sequential refiner."""
    from instantsplat_tpu.pipelines.render_pipeline import (
        make_pose_refiner,
        refine_poses_sharded,
    )
    from instantsplat_tpu.render import render as _render

    g, cams = make_scene(n=120, size=32, views=1, seed=31)
    cam = cams[0]
    rng = np.random.RandomState(7)
    poses0, gts = [], []
    for k in range(3):
        true_pose = jnp.asarray(
            np.array([1, 0, 0, 0, 0, 0, 0]) + 0.02 * rng.randn(7),
            jnp.float32)
        gts.append(_render(g, cam, pose=true_pose, chunk=64,
                           backend="pallas").render)
        poses0.append(true_pose + 0.01 * jnp.asarray(rng.randn(7),
                                                     jnp.float32))
    poses0, gts = jnp.stack(poses0), jnp.stack(gts)

    ref, _ = refine_poses_sharded(g, cam, poses0, gts, mesh=None,
                                  backend="pallas", num_iter=15)
    refiner = make_pose_refiner(g, cam, backend="pallas", num_iter=15)
    for k in range(3):
        bp, _ = refiner(poses0[k], gts[k])
        np.testing.assert_allclose(ref[k], np.asarray(bp), atol=1e-5)
