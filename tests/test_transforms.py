import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantsplat_tpu.utils import transforms as T


def random_quats(key, n):
    q = jax.random.normal(key, (n, 4))
    return T.quat_normalize(q)


def test_quat_to_rotmat_is_rotation():
    q = random_quats(jax.random.PRNGKey(0), 32)
    R = T.quat_to_rotmat(q)
    eye = jnp.broadcast_to(jnp.eye(3), R.shape)
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)
    np.testing.assert_allclose(jnp.linalg.det(R), jnp.ones(32), atol=1e-5)


def test_quat_rotmat_roundtrip():
    q = random_quats(jax.random.PRNGKey(1), 64)
    # canonicalize sign to w >= 0
    q = q * jnp.where(q[:, :1] < 0, -1.0, 1.0)
    q2 = T.rotmat_to_quat(T.quat_to_rotmat(q))
    np.testing.assert_allclose(q, q2, atol=1e-4)


def test_quat_multiply_matches_matrix_product():
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    q1, q2 = random_quats(k1, 16), random_quats(k2, 16)
    R12 = T.quat_to_rotmat(T.quat_multiply(q1, q2))
    np.testing.assert_allclose(R12, T.quat_to_rotmat(q1) @ T.quat_to_rotmat(q2), atol=1e-5)


def test_identity_quat():
    q = jnp.array([1.0, 0.0, 0.0, 0.0])
    np.testing.assert_allclose(T.quat_to_rotmat(q), jnp.eye(3), atol=1e-6)


def test_pose_matrix_roundtrip():
    key = jax.random.PRNGKey(3)
    q = random_quats(key, 8)
    q = q * jnp.where(q[:, :1] < 0, -1.0, 1.0)
    t = jax.random.normal(jax.random.PRNGKey(4), (8, 3))
    pose = jnp.concatenate([q, t], axis=-1)
    M = T.pose_to_matrix(pose)
    assert M.shape == (8, 4, 4)
    np.testing.assert_allclose(M[:, 3], jnp.tile(jnp.array([0, 0, 0, 1.0]), (8, 1)), atol=0)
    pose2 = T.matrix_to_pose(M)
    np.testing.assert_allclose(pose, pose2, atol=1e-4)


def test_se3_inverse():
    q = random_quats(jax.random.PRNGKey(5), 4)
    t = jax.random.normal(jax.random.PRNGKey(6), (4, 3))
    M = T.pose_to_matrix(jnp.concatenate([q, t], axis=-1))
    Minv = T.se3_inverse(M)
    eye = jnp.broadcast_to(jnp.eye(4), M.shape)
    np.testing.assert_allclose(M @ Minv, eye, atol=1e-5)


def test_transform_points():
    M = T.pose_to_matrix(jnp.array([1.0, 0, 0, 0, 1.0, 2.0, 3.0]))
    pts = jnp.zeros((5, 3))
    out = T.transform_points(M, pts)
    np.testing.assert_allclose(out, jnp.tile(jnp.array([1.0, 2.0, 3.0]), (5, 1)), atol=1e-6)


@pytest.mark.parametrize("with_scale", [True, False])
def test_umeyama_recovers_transform(with_scale):
    key = jax.random.PRNGKey(7)
    src = jax.random.normal(key, (100, 3))
    q = random_quats(jax.random.PRNGKey(8), 1)[0]
    R_true = T.quat_to_rotmat(q)
    s_true = 2.5 if with_scale else 1.0
    t_true = jnp.array([0.3, -1.2, 0.7])
    dst = s_true * src @ R_true.T + t_true
    s, R, t = T.umeyama(src, dst, with_scale=with_scale)
    np.testing.assert_allclose(s, s_true, atol=1e-4)
    np.testing.assert_allclose(R, R_true, atol=1e-4)
    np.testing.assert_allclose(t, t_true, atol=1e-4)


def test_weighted_umeyama_ignores_zero_weight_outliers():
    key = jax.random.PRNGKey(9)
    src = jax.random.normal(key, (64, 3))
    R_true = T.quat_to_rotmat(random_quats(jax.random.PRNGKey(10), 1)[0])
    dst = 1.7 * src @ R_true.T + jnp.array([1.0, 0.0, -2.0])
    # corrupt half the correspondences, but give them zero weight
    dst_bad = dst.at[::2].add(100.0)
    w = jnp.ones(64).at[::2].set(0.0)
    s, R, t = T.weighted_umeyama(src, dst_bad, w)
    np.testing.assert_allclose(s, 1.7, atol=1e-4)
    np.testing.assert_allclose(R, R_true, atol=1e-4)


def test_rotmat_to_quat_grad_finite():
    def f(R):
        return jnp.sum(T.rotmat_to_quat(R) ** 2)

    g = jax.grad(f)(jnp.eye(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_numpy_pose_matrix_roundtrip_matches_jax():
    """matrix_to_pose_np / pose_to_matrix_np (host-side converters) agree
    with the jax pair up to quaternion sign, including 180-degree
    (negative-trace) rotations, and round-trip exactly."""
    rng = np.random.default_rng(0)
    qs = rng.standard_normal((32, 4))
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    # append hard cases: identity + axis-aligned 180-degree rotations
    qs = np.concatenate([qs, np.array([
        [1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1],
    ], np.float64)])
    M = np.asarray(T.pose_to_matrix(jnp.asarray(
        np.concatenate([qs, rng.standard_normal((len(qs), 3))], 1),
        jnp.float32)))

    pose_np = T.matrix_to_pose_np(M)
    # rotation must round-trip through the numpy pair exactly
    M2 = T.pose_to_matrix_np(pose_np)
    np.testing.assert_allclose(M2, M, atol=1e-5)
    # and agree with the jax encoder up to quaternion sign
    pose_jax = np.asarray(T.matrix_to_pose(jnp.asarray(M)))
    sign = np.where(
        np.sum(pose_np[:, :4] * pose_jax[:, :4], 1, keepdims=True) < 0,
        -1.0, 1.0)
    np.testing.assert_allclose(pose_np[:, :4], sign * pose_jax[:, :4],
                               atol=1e-4)
    np.testing.assert_allclose(pose_np[:, 4:], pose_jax[:, 4:], atol=1e-5)
    # w >= 0 canonical form (COLMAP convention)
    assert (pose_np[:, 0] >= 0).all()


def test_numpy_pose_matrix_batched_shapes():
    rng = np.random.default_rng(1)
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    pose = np.concatenate([q, [0.5, -1.0, 2.0]]).astype(np.float32)
    batch = np.broadcast_to(pose, (2, 3, 7))
    M = T.pose_to_matrix_np(batch)
    assert M.shape == (2, 3, 4, 4)
    back = T.matrix_to_pose_np(M)
    assert back.shape == (2, 3, 7)
    np.testing.assert_allclose(np.abs(back[..., 0]), abs(pose[0]), atol=1e-5)
