import jax
import jax.numpy as jnp
import numpy as np

from instantsplat_tpu.models.camera import Camera
from instantsplat_tpu.models.gaussians import GaussianModel
from instantsplat_tpu.render import render
from instantsplat_tpu.utils import transforms as T


def make_scene(n=50, seed=0, views=2):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    pts = jax.random.normal(ks[0], (n, 3)) * 0.5 + jnp.array([0.0, 0.0, 4.0])
    cols = jax.random.uniform(ks[1], (n, 3))
    poses = jnp.tile(jnp.array([1.0, 0, 0, 0, 0, 0, 0]), (views, 1))
    g = GaussianModel.create_from_pcd(pts, cols, cam_poses=poses, max_sh_degree=1)
    cam = Camera.create(
        R=np.eye(3), t=np.zeros(3), fx=60.0, fy=60.0, height=48, width=48, uid=0
    )
    return g, cam


def test_render_shapes_and_ranges():
    g, cam = make_scene()
    out = render(g, cam, chunk=64)
    assert out.render.shape == (48, 48, 3)
    assert out.alpha.shape == (48, 48)
    assert out.radii.shape == (50,)
    arr = np.asarray(out.render)
    assert np.all(np.isfinite(arr)) and arr.min() >= 0
    assert np.asarray(out.alpha).max() > 0.01  # something was drawn


def test_single_gaussian_projects_to_expected_pixel():
    pts = jnp.array([[0.5, -0.25, 5.0]])
    cols = jnp.array([[1.0, 1.0, 1.0]])
    g = GaussianModel.create_from_pcd(
        pts, cols, cam_poses=jnp.array([[1.0, 0, 0, 0, 0, 0, 0]]),
        max_sh_degree=0, scale_override=np.array([0.2]),
    )
    g = g.replace(opacity=jnp.full((1, 1), 10.0))  # ~opaque
    cam = Camera.create(np.eye(3), np.zeros(3), fx=100.0, fy=100.0, height=64, width=64)
    out = render(g, cam, chunk=8)
    a = np.asarray(out.alpha)
    peak = np.unravel_index(a.argmax(), a.shape)
    # expected pixel: x = fx * X/Z + cx = 100*0.1 + 31.5 = 41.5; y = -5 + 31.5 = 26.5
    assert abs(peak[1] - 41.5) <= 1.0, peak
    assert abs(peak[0] - 26.5) <= 1.0, peak


def test_pose_override_matches_camera_pose():
    g, cam = make_scene(seed=2)
    out1 = render(g, cam, chunk=64)
    out2 = render(g, cam, pose=cam.pose, chunk=64)
    np.testing.assert_allclose(out1.render, out2.render, atol=0)


def test_pose_gradients_flow():
    g, cam = make_scene(seed=3)
    # anisotropic scales: isotropic Gaussians have exactly zero rotation grad
    g = g.replace(scaling=g.scaling + jnp.array([0.5, -0.5, 0.1]))
    target = jax.random.uniform(jax.random.PRNGKey(9), (48, 48, 3))

    def loss(pose, gauss):
        out = render(gauss, cam, pose=pose, chunk=64)
        return jnp.mean(jnp.abs(out.render - target))

    gp, gg = jax.grad(loss, argnums=(0, 1))(cam.pose, g)
    assert np.all(np.isfinite(np.asarray(gp))) and np.abs(np.asarray(gp)).max() > 0
    for name in ("xyz", "scaling", "rotation", "opacity", "features_dc"):
        arr = np.asarray(getattr(gg, name))
        assert np.all(np.isfinite(arr)), name
        assert np.abs(arr).max() > 0, name


def test_translated_pose_shifts_image():
    g, cam = make_scene(seed=4)
    out0 = np.asarray(render(g, cam, chunk=64).render)
    pose_shift = cam.pose.at[4].add(0.5)  # move camera in x
    out1 = np.asarray(render(g, cam, pose=pose_shift, chunk=64).render)
    assert np.abs(out0 - out1).max() > 0.01


def test_rotated_camera_consistency():
    """Rendering with pose Q equals rendering a scene rigidly transformed by
    Q with identity pose (covariances + SH DC only)."""
    g, cam = make_scene(seed=5)
    q = T.quat_normalize(jnp.array([0.9, 0.1, -0.2, 0.15]))
    t = jnp.array([0.1, -0.2, 0.3])
    pose = jnp.concatenate([q, t])
    out_posed = np.asarray(render(g, cam, pose=pose, chunk=64).render)

    # transform the scene instead
    M = T.pose_to_matrix(pose)
    xyz2 = T.transform_points(M, g.xyz[None])[0]
    R = T.quat_to_rotmat(q)
    rot2 = T.quat_multiply(jnp.broadcast_to(T.rotmat_to_quat(R), (g.num_points, 4)), g.get_rotation())
    g2 = g.replace(xyz=xyz2, rotation=rot2)
    out_ident = np.asarray(render(g2, cam, pose=cam.pose, chunk=64).render)
    np.testing.assert_allclose(out_posed, out_ident, atol=2e-3)


def test_pallas_backend_matches_oracle_driver_level():
    """The packed pallas driver path == oracle driver path, forward and
    full parameter/pose gradients (exercises the variadic-sort front-end)."""
    g, cam = make_scene(n=80, seed=4)
    g = g.replace(scaling=g.scaling + jnp.array([0.4, -0.3, 0.1]))
    target = jax.random.uniform(jax.random.PRNGKey(21), (48, 48, 3))

    def loss(pose, gauss, backend):
        out = render(gauss, cam, pose=pose, chunk=64, backend=backend)
        return jnp.mean(jnp.abs(out.render - target))

    out_o = render(g, cam, chunk=64, backend="oracle")
    out_p = render(g, cam, chunk=64, backend="pallas")
    np.testing.assert_allclose(out_p.render, out_o.render, atol=3e-5)
    np.testing.assert_allclose(out_p.alpha, out_o.alpha, atol=3e-5)

    gp_o, gg_o = jax.grad(loss, argnums=(0, 1))(cam.pose, g, "oracle")
    gp_p, gg_p = jax.grad(loss, argnums=(0, 1))(cam.pose, g, "pallas")
    np.testing.assert_allclose(np.asarray(gp_p), np.asarray(gp_o),
                               rtol=2e-3, atol=1e-6)
    for name in ("xyz", "scaling", "rotation", "opacity", "features_dc"):
        o = np.asarray(getattr(gg_o, name))
        p = np.asarray(getattr(gg_p, name))
        scale = max(np.abs(o).max(), 1e-6)
        np.testing.assert_allclose(p / scale, o / scale, atol=2e-4,
                                   err_msg=f"driver grad mismatch: {name}")


def test_sort_payload_matches_stock_sort_and_vjp():
    """driver.sort_payload: fwd == lax.sort; bwd (one inverse sort) ==
    the stock lax.sort VJP (per-column scatter-adds)."""
    from instantsplat_tpu.render.driver import sort_payload

    rng = np.random.default_rng(3)
    n = 257
    key = jnp.asarray(rng.standard_normal(n), jnp.float32)
    cols = tuple(
        jnp.asarray(rng.standard_normal(n), jnp.float32) for _ in range(4))

    def custom(key, *cols):
        s = sort_payload(key, *cols)
        return sum(jnp.sum(jnp.tanh(x) * (i + 1.0)) for i, x in enumerate(s))

    def stock(key, *cols):
        s = jax.lax.sort((key,) + cols, num_keys=1, is_stable=False)
        return sum(jnp.sum(jnp.tanh(x) * (i + 1.0)) for i, x in enumerate(s))

    np.testing.assert_allclose(custom(key, *cols), stock(key, *cols),
                               rtol=1e-6)
    g_c = jax.grad(custom, argnums=(0, 1, 2, 3, 4))(key, *cols)
    g_s = jax.grad(stock, argnums=(0, 1, 2, 3, 4))(key, *cols)
    for gc, gs in zip(g_c, g_s):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gs),
                                   rtol=1e-6, atol=1e-7)


def test_sort_payload_duplicate_keys():
    """Equal keys: fwd stays a valid permutation of the payload and the
    bwd inverse permutation matches the forward's actual choice (the
    residual perm, not a re-derived one)."""
    from instantsplat_tpu.render.driver import sort_payload

    key = jnp.asarray([1.0, 0.5, 1.0, 0.5, 1.0], jnp.float32)
    col = jnp.asarray([10.0, 20.0, 30.0, 40.0, 50.0], jnp.float32)

    def f(c):
        s = sort_payload(key, c)
        return jnp.sum(s[1] * jnp.asarray([1.0, 2.0, 3.0, 4.0, 5.0]))

    out = sort_payload(key, col)
    assert sorted(np.asarray(out[1]).tolist()) == sorted(col.tolist())
    # each payload element's gradient equals the weight of the slot the
    # forward actually placed it in — a bijection, so grads are a
    # permutation of the weights
    g = np.asarray(jax.grad(f)(col))
    assert sorted(g.tolist()) == [1.0, 2.0, 3.0, 4.0, 5.0]


def test_tiled_backend_matches_oracle_driver_level():
    """The 2-D tiled driver path ("pallas-tiled[:CF:DY:DX]") == oracle,
    forward and full parameter/pose gradients, including the auto-sized
    capacity string from driver.tiled_view_requirements."""
    from instantsplat_tpu.render.driver import tiled_view_requirements

    g, cam = make_scene(n=80, seed=4)
    g = g.replace(scaling=g.scaling + jnp.array([0.4, -0.3, 0.1]))
    target = jax.random.uniform(jax.random.PRNGKey(21), (48, 48, 3))
    cf, dy, dx = tiled_view_requirements(g, cam.pose, cam)
    backend = f"pallas-tiled:{cf}:{dy}:{dx}"

    def loss(pose, gauss, be):
        out = render(gauss, cam, pose=pose, chunk=64, backend=be)
        return jnp.mean(jnp.abs(out.render - target))

    out_o = render(g, cam, chunk=64, backend="oracle")
    out_t = render(g, cam, chunk=64, backend=backend)
    np.testing.assert_allclose(out_t.render, out_o.render, atol=3e-5)
    np.testing.assert_allclose(out_t.alpha, out_o.alpha, atol=3e-5)

    gp_o, gg_o = jax.grad(loss, argnums=(0, 1))(cam.pose, g, "oracle")
    gp_t, gg_t = jax.grad(loss, argnums=(0, 1))(cam.pose, g, backend)
    np.testing.assert_allclose(np.asarray(gp_t), np.asarray(gp_o),
                               rtol=2e-3, atol=1e-6)
    for name in ("xyz", "scaling", "rotation", "opacity", "features_dc"):
        o = np.asarray(getattr(gg_o, name))
        p = np.asarray(getattr(gg_t, name))
        scale = max(np.abs(o).max(), 1e-6)
        np.testing.assert_allclose(p / scale, o / scale, atol=2e-4,
                                   err_msg=f"tiled driver grad mismatch: {name}")
