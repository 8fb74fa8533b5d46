"""Minimum end-to-end slice: synthetic multi-view scene, joint Gaussian +
pose optimization must drive PSNR up and recover perturbed poses.

This is the CPU-scale analogue of BASELINE.json config 1 (3-view, 10k
Gaussians, 200 iters), shrunk so the oracle rasterizer runs fast on the test
backend.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantsplat_tpu.models.camera import Camera
from instantsplat_tpu.models.gaussians import GaussianModel
from instantsplat_tpu.opt import OptimizationConfig
from instantsplat_tpu.ops.losses import psnr
from instantsplat_tpu.pipelines.trainer import TrainerConfig, train_joint
from instantsplat_tpu.render import render
from instantsplat_tpu.utils import transforms as T


def look_at_pose(eye, target=np.zeros(3), up=np.array([0.0, -1.0, 0.0])):
    """w2c pose from camera eye position looking at target."""
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R_c2w = np.stack([right, down, fwd], axis=1)  # columns
    R = R_c2w.T
    t = -R @ eye
    return R, t


def build_synthetic(n_gauss=400, n_views=3, size=48, seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 4)
    pts = jax.random.normal(ks[0], (n_gauss, 3)) * 0.6
    cols = jax.random.uniform(ks[1], (n_gauss, 3), minval=0.1, maxval=0.9)

    angles = np.linspace(-0.4, 0.4, n_views)
    cams = []
    w2cs = []
    for i, a in enumerate(angles):
        eye = np.array([np.sin(a) * 4.0, 0.3, -np.cos(a) * 4.0])
        R, t = look_at_pose(eye)
        cams.append(
            Camera.create(R, t, fx=70.0, fy=70.0, height=size, width=size, uid=i)
        )
        M = np.eye(4, dtype=np.float32)
        M[:3, :3], M[:3, 3] = R, t
        w2cs.append(M)

    true_poses = GaussianModel.init_cam_poses_from_w2c(w2cs)
    gt_model = GaussianModel.create_from_pcd(
        pts, cols, cam_poses=true_poses, max_sh_degree=0
    )
    # make the ground truth scene reasonably opaque
    gt_model = gt_model.replace(opacity=jnp.full((n_gauss, 1), 1.5))

    # ground-truth renders
    cams = [
        c.replace(image=render(gt_model, c, chunk=64).render) for c in cams
    ]
    return gt_model, cams, true_poses


@pytest.mark.slow
def test_joint_optimization_improves_psnr_and_poses():
    gt_model, cams, true_poses = build_synthetic()
    n = gt_model.num_points

    # Perturb: noisy positions/colors, perturbed poses (as if from noisy init)
    key = jax.random.PRNGKey(42)
    ks = jax.random.split(key, 4)
    noisy_poses = true_poses + 0.01 * jax.random.normal(ks[2], true_poses.shape)
    noisy_poses = noisy_poses.at[:, :4].set(
        T.quat_normalize(noisy_poses[:, :4])
    )
    init = gt_model.replace(
        xyz=gt_model.xyz + 0.02 * jax.random.normal(ks[0], (n, 3)),
        features_dc=gt_model.features_dc
        + 0.3 * jax.random.normal(ks[1], gt_model.features_dc.shape),
        opacity=jnp.zeros_like(gt_model.opacity),
        cam_poses=noisy_poses,
    )

    def eval_psnr(model):
        vals = []
        for i, c in enumerate(cams):
            out = render(model, c, pose=model.get_pose(i), chunk=64)
            vals.append(float(psnr(out.render, c.image)))
        return float(np.mean(vals))

    psnr0 = eval_psnr(init)
    params, _, history = train_joint(
        init,
        cams,
        opt_cfg=OptimizationConfig(optim_pose=True),
        trainer_cfg=TrainerConfig(iterations=150, chunk=64, log_every=50),
    )
    psnr1 = eval_psnr(params)
    assert psnr1 > psnr0 + 3.0, (psnr0, psnr1, history)

    # pose error must shrink
    def pose_err(poses):
        return float(jnp.mean(jnp.abs(poses - true_poses)))

    assert pose_err(params.cam_poses) < pose_err(noisy_poses)


@pytest.mark.slow
def test_per_point_optimizer_runs_and_converges():
    gt_model, cams, true_poses = build_synthetic(n_gauss=200, size=32, seed=1)
    key = jax.random.PRNGKey(7)
    init = gt_model.replace(
        features_dc=jnp.zeros_like(gt_model.features_dc),
        opacity=jnp.zeros_like(gt_model.opacity),
    )
    conf = jax.random.normal(key, (200,))  # fake MASt3R confidence
    from instantsplat_tpu.opt import confidence_to_lr

    params, opt_state, history = train_joint(
        init,
        cams,
        opt_cfg=OptimizationConfig(optim_pose=True, pp_optimizer=True),
        trainer_cfg=TrainerConfig(iterations=80, chunk=64, log_every=40),
        confidence_lr=confidence_to_lr(conf),
    )
    losses = [m["loss"] for _, m in history]
    assert losses[-1] < losses[0]
    # per-point lr must have adapted (multiplied by 0.99+0.02*sigmoid each step)
    assert opt_state.per_point_lr is not None
    assert float(jnp.std(opt_state.per_point_lr)) > 0


def test_scan_block_matches_per_step():
    """The lax.scan-fused training block is bit-for-bit the per-step loop.

    Exercises log-boundary splits AND an SH-ramp boundary inside the run
    (sh_up_interval=10 with a degree-1 model) so the block splitter is
    covered."""
    gt_model, cams, true_poses = build_synthetic(n_gauss=120, size=24, seed=3)
    # re-make with SH degree 1 so the ramp boundary matters
    init = GaussianModel.create_from_pcd(
        gt_model.xyz, jnp.clip(gt_model.features_dc[:, 0] * 0.28 + 0.5, 0, 1),
        cam_poses=true_poses, max_sh_degree=1,
    ).replace(opacity=jnp.zeros((120, 1)))

    kwargs = dict(
        opt_cfg=OptimizationConfig(optim_pose=True),
        spatial_lr_scale=1.0,
    )
    cfg = dict(iterations=25, chunk=64, log_every=5, sh_up_interval=10)
    p_step, _, h_step = train_joint(
        init, cams, trainer_cfg=TrainerConfig(scan=False, **cfg), **kwargs
    )
    p_scan, _, h_scan = train_joint(
        init, cams, trainer_cfg=TrainerConfig(scan=True, **cfg), **kwargs
    )
    # Same math, different XLA fusions => float-associativity drift only.
    # Per-point Adam normalizes near-zero grads to full-LR steps, so
    # associativity noise can flip a ~1e-12 grad's sign and random-walk the
    # unconstrained DOF of INVISIBLE gaussians (their rotations especially)
    # by lr-sized steps — element-wise comparison of those leaves is
    # fundamentally fragile. Structural errors (wrong view order, LR
    # schedule, SH boundary) instead move the OBSERVABLES: compare the
    # loss trajectory, the well-conditioned leaves, and the renders.
    assert [it for it, _ in h_step] == [it for it, _ in h_scan]
    for (_, ms), (_, mc) in zip(h_step, h_scan):
        np.testing.assert_allclose(ms["loss"], mc["loss"], rtol=1e-3)
    np.testing.assert_allclose(p_step.cam_poses, p_scan.cam_poses,
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(p_step.xyz, p_scan.xyz, atol=1e-3)
    for i, c in enumerate(cams):
        img_a = np.asarray(render(p_step, c, pose=p_step.get_pose(i),
                                  chunk=64).render)
        img_b = np.asarray(render(p_scan, c, pose=p_scan.get_pose(i),
                                  chunk=64).render)
        assert np.max(np.abs(img_a - img_b)) < 5e-3, (
            f"view {i}: {np.max(np.abs(img_a - img_b))}")


def test_checkpoint_resume_roundtrip(tmp_path):
    """save_checkpoint/load_checkpoint restore params + optimizer state."""
    import jax.numpy as jnp
    import numpy as np

    from instantsplat_tpu.models.gaussians import GaussianModel
    from instantsplat_tpu.opt.gaussian_opt import (
        GaussianOptimizer,
        OptimizationConfig,
    )
    from instantsplat_tpu.pipelines.train_pipeline import (
        load_checkpoint,
        save_checkpoint,
    )

    rng = np.random.default_rng(0)
    n = 50
    params = GaussianModel(
        xyz=jnp.asarray(rng.standard_normal((n, 3)), jnp.float32),
        features_dc=jnp.asarray(rng.standard_normal((n, 1, 3)), jnp.float32),
        features_rest=jnp.zeros((n, 15, 3), jnp.float32),
        scaling=jnp.asarray(rng.standard_normal((n, 3)), jnp.float32),
        rotation=jnp.zeros((n, 4), jnp.float32).at[:, 0].set(1.0),
        opacity=jnp.zeros((n, 1), jnp.float32),
        cam_poses=jnp.asarray(rng.standard_normal((3, 7)), jnp.float32),
    )
    opt = GaussianOptimizer(OptimizationConfig(pp_optimizer=True))
    state = opt.init(params)
    # make the state non-trivial
    grads = jax.tree.map(jnp.ones_like, params)
    params2, state2 = opt.step(params, grads, state, jnp.int32(1))

    path = tmp_path / "ck.npz"
    save_checkpoint(path, params2, state2, 123)
    p3, s3, it = load_checkpoint(path)
    assert it == 123
    np.testing.assert_allclose(p3.xyz, params2.xyz)
    np.testing.assert_allclose(s3.m.scaling, state2.m.scaling)
    np.testing.assert_allclose(s3.per_point_lr, state2.per_point_lr)
    assert int(s3.step) == int(state2.step)


def test_orbax_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from instantsplat_tpu.models.gaussians import GaussianModel
    from instantsplat_tpu.opt.gaussian_opt import (
        GaussianOptimizer,
        OptimizationConfig,
    )
    from instantsplat_tpu.pipelines.train_pipeline import (
        load_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    rng = np.random.default_rng(1)
    n = 30
    params = GaussianModel(
        xyz=jnp.asarray(rng.standard_normal((n, 3)), jnp.float32),
        features_dc=jnp.asarray(rng.standard_normal((n, 1, 3)), jnp.float32),
        features_rest=jnp.zeros((n, 15, 3), jnp.float32),
        scaling=jnp.asarray(rng.standard_normal((n, 3)), jnp.float32),
        rotation=jnp.zeros((n, 4), jnp.float32).at[:, 0].set(1.0),
        opacity=jnp.zeros((n, 1), jnp.float32),
        cam_poses=jnp.asarray(rng.standard_normal((2, 7)), jnp.float32),
    )
    opt = GaussianOptimizer(OptimizationConfig())
    state = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    params, state = opt.step(params, grads, state, jnp.int32(1))

    save_checkpoint_orbax(tmp_path / "ck_orbax", params, state, 77)
    p2, s2, it = load_checkpoint_orbax(tmp_path / "ck_orbax")
    assert it == 77
    np.testing.assert_allclose(p2.xyz, params.xyz)
    np.testing.assert_allclose(s2.v.opacity, state.v.opacity)
    assert int(s2.step) == 1


def test_dispatch_governor_caps_blocks(monkeypatch):
    """A tiny dispatch budget forces the scan-block governor down to
    1-iteration blocks; the trajectory matches the unconstrained run
    (identical per-iteration math, only dispatch boundaries move)."""
    gt_model, cams, true_poses = build_synthetic(n_gauss=100, size=24,
                                                 seed=5)
    init = GaussianModel.create_from_pcd(
        gt_model.xyz, jnp.clip(gt_model.features_dc[:, 0] * 0.28 + 0.5,
                               0, 1),
        cam_poses=true_poses, max_sh_degree=0,
    )
    kwargs = dict(opt_cfg=OptimizationConfig(optim_pose=True),
                  spatial_lr_scale=1.0)
    cfg = dict(iterations=20, chunk=64, log_every=10)
    monkeypatch.setenv("INSTANTSPLAT_DISPATCH_BUDGET_S", "1e-9")
    p_capped, _, h_capped = train_joint(
        init, cams, trainer_cfg=TrainerConfig(**cfg), **kwargs)
    monkeypatch.setenv("INSTANTSPLAT_DISPATCH_BUDGET_S", "0")  # disabled
    p_full, _, h_full = train_joint(
        init, cams, trainer_cfg=TrainerConfig(**cfg), **kwargs)
    assert [it for it, _ in h_capped] == [it for it, _ in h_full]
    for (_, mc), (_, mf) in zip(h_capped, h_full):
        np.testing.assert_allclose(mc["loss"], mf["loss"], rtol=1e-3)
    np.testing.assert_allclose(p_capped.cam_poses, p_full.cam_poses,
                               rtol=1e-5, atol=1e-6)


def test_backend_auto_probes_and_trains():
    """backend='auto' probes dense vs binned scan blocks, keeps one, and
    the run still converges (both kernels are exact, so which one wins on
    the CPU test backend is irrelevant)."""
    gt_model, cams, true_poses = build_synthetic(n_gauss=100, size=24,
                                                 seed=7)
    init = GaussianModel.create_from_pcd(
        gt_model.xyz, jnp.clip(gt_model.features_dc[:, 0] * 0.28 + 0.5,
                               0, 1),
        cam_poses=true_poses, max_sh_degree=0,
    )
    params, _, history = train_joint(
        init, cams,
        opt_cfg=OptimizationConfig(optim_pose=True),
        trainer_cfg=TrainerConfig(iterations=60, chunk=64, log_every=20,
                                  backend="auto"),
        spatial_lr_scale=1.0,
    )
    assert history[-1][1]["loss"] < history[0][1]["loss"] * 1.5
    assert np.isfinite(history[-1][1]["psnr"])


def test_backend_reprobe_resizes_and_switches(monkeypatch):
    """The periodic re-probe path (capacity re-sizing + timed swap +
    governor re-fit) runs end-to-end: with the cadence shrunk, training
    passes through reprobe states 1/2 several times, re-sizes the
    capacity backend against the live scene, and finishes with finite
    metrics regardless of which backend wins the timings."""
    import instantsplat_tpu.pipelines.trainer as tr

    monkeypatch.setattr(tr, "_REPROBE_EVERY", 8)
    gt_model, cams, true_poses = build_synthetic(n_gauss=100, size=24,
                                                 seed=7)
    init = GaussianModel.create_from_pcd(
        gt_model.xyz, jnp.clip(gt_model.features_dc[:, 0] * 0.28 + 0.5,
                               0, 1),
        cam_poses=true_poses, max_sh_degree=0,
    )
    cfg = tr.TrainerConfig(iterations=48, chunk=64, log_every=8,
                           backend="auto")
    params, _, history = tr.train_joint(
        init, cams, opt_cfg=OptimizationConfig(optim_pose=True),
        trainer_cfg=cfg)
    assert history and np.isfinite(history[-1][1]["loss"])


def test_auto_candidate_prefers_tiled_falls_back_binned():
    """_binned_candidate returns a tiled string when the scene's tile
    levels are in range and falls back to the 1-D binned kernel when
    giant splats blow the level product (VERDICT r5: tiled targets the
    small-splat fused-cloud regime)."""
    import instantsplat_tpu.pipelines.trainer as tr
    from instantsplat_tpu.models.camera import Camera

    rng = np.random.default_rng(0)
    n = 3000
    side = int(np.ceil(np.sqrt(n)))
    gy, gx = np.meshgrid(np.arange(side), np.arange(side))
    g = (np.stack([gx, gy], -1).reshape(-1, 2)[:n] / side - 0.5) * 3.0
    pts = np.concatenate(
        [g, 6.0 + 0.05 * rng.standard_normal((n, 1))], 1).astype(np.float32)
    cols = rng.random((n, 3)).astype(np.float32)
    poses = jnp.tile(jnp.array([1.0, 0, 0, 0, 0, 0, 0]), (1, 1))
    params = GaussianModel.create_from_pcd(
        jnp.asarray(pts), jnp.asarray(cols), cam_poses=poses,
        max_sh_degree=0)
    params = params.replace(opacity=jnp.full_like(params.opacity, 2.0))
    cam = Camera.create(np.eye(3), np.zeros(3), fx=300.0, fy=300.0,
                        height=384, width=512, uid=0)

    cand = tr._binned_candidate(params, cam)
    assert cand is not None and cand.startswith("pallas-tiled:"), cand

    # giant splats: tile levels blow past the product cap -> not tiled
    big = params.replace(scaling=params.scaling + float(np.log(256.0)))
    cand_big = tr._binned_candidate(big, cam)
    assert cand_big is None or not cand_big.startswith("pallas-tiled:"), \
        cand_big


def test_demotion_refits_dispatch_governor(monkeypatch, capsys):
    """When the periodic re-probe demotes the capacity backend (fresh
    sizing unreasonable for the drifted scene), the dispatch governor
    must be re-fitted to the adopted backend's measured rate IMMEDIATELY:
    block_cap was fitted to the faster program, and one full-length block
    on the slower one can become a single dispatch past the runtime's
    ~60 s deadline (observed on the chip as a deterministic "TPU worker
    crashed" at the same iteration on every watchdog retry — round 5)."""
    import time as _time

    import instantsplat_tpu.pipelines.trainer as tr

    monkeypatch.setattr(tr, "_REPROBE_EVERY", 8)
    # rig the initial probe: the dense scan fn sleeps, so the capacity
    # backend deterministically wins and becomes `cur`
    real_mts = tr.make_train_scan

    def slow_dense(*a, **k):
        fn = real_mts(*a, **k)
        if a[4] == "pallas":
            def wrapped(*fa, **fk):
                _time.sleep(0.6)
                return fn(*fa, **fk)
            return wrapped
        return fn

    monkeypatch.setattr(tr, "make_train_scan", slow_dense)
    # sizing: valid capacity candidate at iteration 0, "unreasonable"
    # (None) at every re-probe -> demotion branch
    calls = {"n": 0}
    real_cand = tr._binned_candidate

    def flaky_cand(params, cam):
        calls["n"] += 1
        return real_cand(params, cam) if calls["n"] == 1 else None

    monkeypatch.setattr(tr, "_binned_candidate", flaky_cand)

    gt_model, cams, true_poses = build_synthetic(n_gauss=100, size=24,
                                                 seed=7)
    init = GaussianModel.create_from_pcd(
        gt_model.xyz, jnp.clip(gt_model.features_dc[:, 0] * 0.28 + 0.5,
                               0, 1),
        cam_poses=true_poses, max_sh_degree=0,
    )
    cfg = tr.TrainerConfig(iterations=40, chunk=64, log_every=8,
                           backend="auto")
    params, _, history = tr.train_joint(
        init, cams, opt_cfg=OptimizationConfig(optim_pose=True),
        trainer_cfg=cfg)
    out = capsys.readouterr().out
    assert "demoting binned" in out, out
    assert "re-capped" in out, out
    assert history and np.isfinite(history[-1][1]["loss"])
