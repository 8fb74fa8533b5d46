"""Densification machinery, reciprocal NN matching, pose viz."""

import numpy as np
import jax.numpy as jnp

from instantsplat_tpu.models.densify import (
    densify_and_clone,
    densify_and_split,
    prune_points,
    reset_opacity,
)
from instantsplat_tpu.models.gaussians import GaussianModel, inverse_sigmoid
from instantsplat_tpu.opt.gaussian_opt import GaussianOptimizer, OptimizationConfig
from instantsplat_tpu.ops.matching import fast_reciprocal_nns, nn_indices


def _params(n=20, seed=0):
    rng = np.random.default_rng(seed)
    p = GaussianModel(
        xyz=jnp.asarray(rng.standard_normal((n, 3)), jnp.float32),
        features_dc=jnp.asarray(rng.standard_normal((n, 1, 3)), jnp.float32),
        features_rest=jnp.zeros((n, 15, 3), jnp.float32),
        scaling=jnp.asarray(
            np.log(rng.uniform(0.01, 0.5, (n, 3))), jnp.float32),
        rotation=jnp.zeros((n, 4), jnp.float32).at[:, 0].set(1.0),
        opacity=jnp.asarray(
            inverse_sigmoid(jnp.asarray(
                rng.uniform(0.02, 0.9, (n, 1)), jnp.float32))),
        cam_poses=jnp.zeros((2, 7), jnp.float32),
    )
    opt = GaussianOptimizer(OptimizationConfig(pp_optimizer=True))
    state = opt.init(p)
    return p, state


def test_prune_by_opacity():
    p, s = _params()
    low = np.asarray(p.get_opacity()[:, 0]) < 0.05
    p2, s2 = prune_points(p, s, min_opacity=0.05)
    assert p2.num_points == (~low).sum()
    assert s2.m.xyz.shape[0] == p2.num_points
    assert s2.per_point_lr.shape[0] == p2.num_points
    # cam poses untouched
    np.testing.assert_array_equal(p2.cam_poses, p.cam_poses)


def test_clone_adds_small_high_grad_points():
    p, s = _params()
    grads = jnp.zeros(p.num_points).at[3].set(1.0).at[7].set(1.0)
    p2, s2 = densify_and_clone(p, s, grads, grad_threshold=0.5,
                               extent=100.0)  # all scales "small"
    assert p2.num_points == p.num_points + 2
    np.testing.assert_allclose(p2.xyz[-2], p.xyz[3])
    # new moments start at zero
    assert float(jnp.abs(s2.m.xyz[-2:]).max()) == 0.0


def test_split_replaces_large_points():
    p, s = _params()
    grads = jnp.zeros(p.num_points).at[5].set(1.0)
    p2, s2 = densify_and_split(p, s, grads, grad_threshold=0.5,
                               extent=1e-6)  # all scales "large"
    # one split: +2 samples, -1 original
    assert p2.num_points == p.num_points + 1
    # split scales shrunk by 1.6
    orig_scale = np.exp(np.asarray(p.scaling[5]))
    new_scales = np.exp(np.asarray(p2.scaling[-2:]))
    np.testing.assert_allclose(
        new_scales, np.tile(orig_scale / 1.6, (2, 1)), rtol=1e-5)


def test_reset_opacity():
    p, _ = _params()
    p2 = reset_opacity(p)
    assert float(p2.get_opacity().max()) <= 0.01 + 1e-6


def test_nn_indices_exact():
    rng = np.random.default_rng(1)
    db = rng.standard_normal((500, 8)).astype(np.float32)
    q = db[[3, 77, 400]] + 1e-4
    idx = np.asarray(nn_indices(jnp.asarray(q), jnp.asarray(db), chunk=128))
    np.testing.assert_array_equal(idx, [3, 77, 400])


def test_fast_reciprocal_nns_identity():
    """Matching an image against itself: every seed matches itself."""
    rng = np.random.default_rng(2)
    desc = rng.standard_normal((24, 32, 8)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    p1, p2 = fast_reciprocal_nns(desc, desc, subsample=8, chunk=256)
    assert len(p1) > 0
    np.testing.assert_array_equal(p1, p2)


def test_fast_reciprocal_nns_shifted():
    """A horizontally rolled copy matches with the same shift."""
    rng = np.random.default_rng(3)
    desc = rng.standard_normal((16, 40, 8)).astype(np.float32)
    shift = 5
    desc2 = np.roll(desc, -shift, axis=1)
    p1, p2 = fast_reciprocal_nns(desc, desc2, subsample=4, chunk=256)
    # keep matches away from the wrap boundary
    inner = (p1[:, 0] >= shift) & (p1[:, 0] < 40 - shift)
    assert inner.sum() > 10
    np.testing.assert_array_equal(p2[inner, 0], p1[inner, 0] - shift)
    np.testing.assert_array_equal(p2[inner, 1], p1[inner, 1])


def test_pose_viz_writes_png(tmp_path):
    from instantsplat_tpu.eval.pose_viz import plot_pose

    mats = np.tile(np.eye(4), (5, 1, 1))
    mats[:, :3, 3] = np.linspace(0, 1, 5)[:, None]
    out = plot_pose(mats, mats, tmp_path / "pose_vis.png")
    assert (tmp_path / "pose_vis.png").exists()


def test_profile_trace_writes_trace(tmp_path):
    """SURVEY §5 profiling subsystem: a traced jitted region produces a
    TensorBoard-plugin trace directory; no-op when disabled."""
    import jax
    import jax.numpy as jnp

    from instantsplat_tpu.utils.profiling import annotate, profile_trace

    logdir = tmp_path / "trace"
    with profile_trace(logdir):
        with annotate("golden-matmul"):
            x = jax.jit(lambda a: a @ a)(jnp.ones((64, 64)))
            jax.block_until_ready(x)
    produced = list(logdir.rglob("*"))
    assert any(p.is_file() for p in produced), produced

    with profile_trace(None):  # disabled: must be a clean no-op
        pass


def test_trainer_profile_dir(tmp_path):
    """TrainerConfig.profile_dir traces the second scanned block."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from instantsplat_tpu.models.camera import Camera
    from instantsplat_tpu.models.gaussians import GaussianModel
    from instantsplat_tpu.opt import OptimizationConfig
    from instantsplat_tpu.pipelines.trainer import TrainerConfig, train_joint

    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    pts = jax.random.normal(ks[0], (128, 3)) * 0.5 + jnp.array([0., 0., 3.])
    cols = jax.random.uniform(ks[1], (128, 3))
    poses = jnp.tile(jnp.array([1., 0, 0, 0, 0, 0, 0]), (1, 1))
    g = GaussianModel.create_from_pcd(pts, cols, cam_poses=poses,
                                      max_sh_degree=0)
    cam = Camera.create(np.eye(3), np.zeros(3), fx=40., fy=40.,
                        height=16, width=24, uid=0,
                        image=jnp.zeros((16, 24, 3)))
    logdir = tmp_path / "prof"
    train_joint(g, [cam],
                opt_cfg=OptimizationConfig(optim_pose=False),
                trainer_cfg=TrainerConfig(iterations=4, log_every=2,
                                          profile_dir=str(logdir)))
    assert any(p.is_file() for p in logdir.rglob("*"))


def test_mean_knn_dist2_matches_brute_force_far_from_origin():
    """ops/knn.mean_knn_dist2 (the distCUDA2 role, scene/gaussian_model.py:
    156) must stay exact when NN distances are tiny relative to |p| — the
    naive Gram expansion |q|^2+|p|^2-2qp loses exactly this regime to f32
    cancellation (found inflating init scales ~10x on a real-scale scene,
    which silently disqualified the binned rasterizer's capacity sizing)."""
    import numpy as np
    import jax.numpy as jnp

    from instantsplat_tpu.ops.knn import mean_knn_dist2

    rng = np.random.default_rng(0)
    # dense cloud (tiny NN distances) far from the origin
    pts = (rng.random((5000, 3)).astype(np.float32) * 0.05
           + np.array([3.0, -2.0, 7.0], np.float32))
    got = np.asarray(mean_knn_dist2(jnp.asarray(pts), k=3))
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    ref = np.maximum(np.sort(d2, axis=1)[:, :3].mean(1), 1e-7)
    np.testing.assert_allclose(got, ref, rtol=1e-4)
