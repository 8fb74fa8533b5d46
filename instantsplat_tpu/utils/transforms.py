"""Quaternion / SE(3) / sim(3) math, batched and differentiable.

Conventions (chosen to match the reference semantics so that checkpoints,
COLMAP artifacts, and pose metrics interoperate):
- quaternions are [w, x, y, z] and normalized before use
  (reference: utils/pose_utils.py:35-55 `quad2rotation`,
  utils/general_utils.py:78-99 `build_rotation`);
- a camera pose vector is `[qw qx qy qz tx ty tz]` decoding to a 4x4
  world-to-camera matrix (reference: utils/pose_utils.py:57-84
  `get_camera_from_tensor`);
- sim(3)/Umeyama alignment follows the classic closed form used by the
  reference's trajectory alignment (utils/utils_poses/ATE/align_trajectory.py).

Everything here is shape-polymorphic over leading batch dims and jit/vmap/grad
friendly (no data-dependent control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_EPS = 1e-12


def quat_normalize(q: Array, eps: float = _EPS) -> Array:
    """Normalize quaternion(s) [..., 4] to unit norm (grad-safe near 0)."""
    norm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + eps)
    return q / norm


def quat_to_rotmat(q: Array) -> Array:
    """Quaternion(s) [..., 4] (wxyz) -> rotation matrix [..., 3, 3].

    Same expansion as the reference `build_rotation`
    (utils/general_utils.py:78-99); input is normalized internally.
    """
    q = quat_normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    rows = [
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def rotmat_to_quat(R: Array) -> Array:
    """Rotation matrix [..., 3, 3] -> quaternion [..., 4] (wxyz), branch-free.

    Uses the 4-candidate construction (one per largest diagonal element) with a
    `where` select so it is differentiable a.e. and vmap-safe. The reference's
    grad-safe converter is utils/pose_utils.py:117-180 (`rotation2quad`).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    def _sqrtp(x):
        # sqrt(max(0, x)) with zero subgradient at 0.
        safe = jnp.maximum(x, 0.0)
        return jnp.sqrt(safe + _EPS) - jnp.sqrt(_EPS)

    q_abs = jnp.stack(
        [
            _sqrtp(1.0 + m00 + m11 + m22),
            _sqrtp(1.0 + m00 - m11 - m22),
            _sqrtp(1.0 - m00 + m11 - m22),
            _sqrtp(1.0 - m00 - m11 + m22),
        ],
        axis=-1,
    )
    # Candidate quaternions, each scaled by the matching q_abs entry.
    quat_by_w = jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    quat_by_x = jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1)
    quat_by_y = jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1)
    quat_by_z = jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1)
    cands = jnp.stack([quat_by_w, quat_by_x, quat_by_y, quat_by_z], axis=-2)  # [..., 4, 4]
    denom = 2.0 * jnp.maximum(q_abs, 0.1)[..., None]
    cands = cands / denom
    best = jnp.argmax(q_abs, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, axis=-1), axis=-2)
    q = q[..., 0, :]
    # Canonicalize sign (w >= 0) and normalize.
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return quat_normalize(q)


def quat_multiply(q1: Array, q2: Array) -> Array:
    """Hamilton product of wxyz quaternions [..., 4].

    Matches the reference `quadmultiply` (utils/pose_utils.py:86-104) which
    pre-rotates Gaussian orientations by the camera pose.
    """
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def pose_to_matrix(pose: Array) -> Array:
    """Pose vector(s) [..., 7] = [quat(wxyz), t] -> 4x4 world-to-camera.

    Reference decode: utils/pose_utils.py:57-84 (`get_camera_from_tensor`).
    """
    R = quat_to_rotmat(pose[..., :4])
    t = pose[..., 4:7]
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)  # [..., 3, 4]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=pose.dtype), (*pose.shape[:-1], 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def matrix_to_pose(M: Array) -> Array:
    """4x4 (or [..., 4, 4]) world-to-camera -> pose vector [..., 7].

    Reference encode: utils/pose_utils.py:183-215 (`get_tensor_from_camera`).
    """
    q = rotmat_to_quat(M[..., :3, :3])
    t = M[..., :3, 3]
    return jnp.concatenate([q, t], axis=-1)


def pose_to_matrix_np(pose) -> "np.ndarray":
    """Numpy `pose_to_matrix` for host-side paths (see matrix_to_pose_np)."""
    import numpy as np

    from instantsplat_tpu.data.colmap import qvec_to_rotmat

    pose = np.asarray(pose, np.float64)
    batch = pose.shape[:-1]
    flat = pose.reshape(-1, 7)
    out = np.tile(np.eye(4, dtype=np.float32), (flat.shape[0], 1, 1))
    for k in range(flat.shape[0]):
        q = flat[k, :4]
        out[k, :3, :3] = qvec_to_rotmat(q / np.linalg.norm(q))
        out[k, :3, 3] = flat[k, 4:7]
    return out.reshape(*batch, 4, 4)


def matrix_to_pose_np(M) -> "np.ndarray":
    """Numpy `matrix_to_pose` for host-side (scene-loading) paths.

    Eager jnp ops on tiny inputs compile each op separately, which is
    pathologically slow over a remote-device tunnel (minutes for a 3x3
    helper) — host code must stay off the device. Quaternion sign may
    differ from `matrix_to_pose` (w >= 0 here); every consumer
    (quat_to_rotmat, pose optimization, pose IO) is sign-invariant.
    """
    import numpy as np

    from instantsplat_tpu.data.colmap import rotmat_to_qvec

    M = np.asarray(M, np.float64)
    batch = M.shape[:-2]
    flat = M.reshape(-1, 4, 4)
    out = np.empty((flat.shape[0], 7), np.float32)
    for k in range(flat.shape[0]):
        out[k, :4] = rotmat_to_qvec(flat[k, :3, :3])
        out[k, 4:7] = flat[k, :3, 3]
    return out.reshape(*batch, 7)


def se3_inverse(M: Array) -> Array:
    """Invert rigid transform(s) [..., 4, 4] without a general solve."""
    R = M[..., :3, :3]
    t = M[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    t_inv = -jnp.einsum("...ij,...j->...i", Rt, t)
    top = jnp.concatenate([Rt, t_inv[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=M.dtype), (*M.shape[:-2], 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def transform_points(M: Array, pts: Array) -> Array:
    """Apply rigid/affine 4x4 transform(s) to points [..., N, 3]."""
    return jnp.einsum("...ij,...nj->...ni", M[..., :3, :3], pts) + M[..., None, :3, 3]


def umeyama(src: Array, dst: Array, with_scale: bool = True):
    """Closed-form sim(3) alignment: find (s, R, t) with dst ~= s * R @ src + t.

    Umeyama (1991); the same algorithm the reference uses for sim3 trajectory
    alignment (utils/utils_poses/ATE/align_trajectory.py:37+) and for
    `roma.rigid_points_registration` in MST init
    (dust3r/cloud_opt/init_im_poses.py:175-196).

    Args:
      src, dst: [N, 3] point sets.
      with_scale: solve for scale (sim3) or fix s=1 (SE3).

    Returns: (s, R, t) with s scalar, R [3,3], t [3].
    """
    mu_s = jnp.mean(src, axis=0)
    mu_d = jnp.mean(dst, axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / src.shape[0]  # [3,3]
    U, D, Vt = jnp.linalg.svd(cov)
    S = jnp.eye(3, dtype=src.dtype)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    S = S.at[2, 2].set(jnp.where(det < 0, -1.0, 1.0))
    R = U @ S @ Vt
    var_s = jnp.mean(jnp.sum(xs * xs, axis=-1))
    s = jnp.where(with_scale, jnp.trace(jnp.diag(D) @ S) / jnp.maximum(var_s, _EPS), 1.0)
    t = mu_d - s * R @ mu_s
    return s, R, t


def weighted_umeyama(src: Array, dst: Array, w: Array, with_scale: bool = True):
    """Weighted sim(3) registration (weights w [N] >= 0), used by the global
    aligner's per-edge registration (reference: roma.rigid_points_registration
    with `weights=conf`, dust3r/cloud_opt/init_im_poses.py:175-196)."""
    wsum = jnp.maximum(jnp.sum(w), _EPS)
    wn = (w / wsum)[:, None]
    mu_s = jnp.sum(wn * src, axis=0)
    mu_d = jnp.sum(wn * dst, axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = (xd * wn).T @ xs
    U, D, Vt = jnp.linalg.svd(cov)
    S = jnp.eye(3, dtype=src.dtype)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    S = S.at[2, 2].set(jnp.where(det < 0, -1.0, 1.0))
    R = U @ S @ Vt
    var_s = jnp.sum(wn[:, 0] * jnp.sum(xs * xs, axis=-1))
    s = jnp.where(with_scale, jnp.trace(jnp.diag(D) @ S) / jnp.maximum(var_s, _EPS), 1.0)
    t = mu_d - s * R @ mu_s
    return s, R, t
