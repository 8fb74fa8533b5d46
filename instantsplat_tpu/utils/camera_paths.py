"""Camera path generation: B-spline pose interpolation + lookat frames.

Reference: utils/camera_utils.py:127-206 (`generate_interpolated_path`,
`viewmatrix`, `transform_poses_pca`) — the smooth camera trajectories used
for (a) pre-initializing test-view poses from interpolated train poses
(init_geo.py:86-115) and (b) the 30 fps novel-view video sweep
(render.py:36-76 save_interpolate_pose).

The spline runs over poses converted to (position, lookat-point, up-point)
triplets so rotation interpolates through geometry rather than quaternion
space; identical parameters (degree 5, smoothness 0.03, rot_weight 0.1).
"""

from __future__ import annotations

import numpy as np
import scipy.interpolate


def _normalize(x):
    return x / np.linalg.norm(x)


def viewmatrix(lookdir, up, position):
    """[3,4] c2w with columns (right, up', forward, position)."""
    vec2 = _normalize(lookdir)
    vec0 = _normalize(np.cross(up, vec2))
    vec1 = _normalize(np.cross(vec2, vec0))
    return np.stack([vec0, vec1, vec2, position], axis=1)


def generate_interpolated_path(poses, n_interp, spline_degree=5,
                               smoothness=0.03, rot_weight=0.1):
    """Smooth spline through [N,3,4] (or [N,4,4]) pose keyframes.

    Returns [n_interp * (N-1), 3, 4].
    """
    poses = np.asarray(poses)[:, :3, :4]

    def poses_to_points(poses, dist):
        pos = poses[:, :3, -1]
        lookat = poses[:, :3, -1] - dist * poses[:, :3, 2]
        up = poses[:, :3, -1] + dist * poses[:, :3, 1]
        return np.stack([pos, lookat, up], 1)

    def points_to_poses(points):
        return np.array([viewmatrix(p - l, u - p, p) for p, l, u in points])

    def interp(points, n, k, s):
        sh = points.shape
        pts = points.reshape(sh[0], -1)
        k = min(k, sh[0] - 1)
        tck, _ = scipy.interpolate.splprep(pts.T, k=k, s=s)
        u = np.linspace(0, 1, n, endpoint=False)
        new_points = np.array(scipy.interpolate.splev(u, tck))
        return new_points.T.reshape(n, sh[1], sh[2])

    points = poses_to_points(poses, dist=rot_weight)
    new_points = interp(points, n_interp * (points.shape[0] - 1),
                        k=spline_degree, s=smoothness)
    return points_to_poses(new_points)


def interpolate_between_all(poses, n_interp):
    """Chain pairwise interpolation over consecutive keyframes and append
    the final keyframe — the pattern used by both init_geo.py:93-101 and
    render.py:36-57. poses: [N,4,4] (or [N,3,4]); returns [M,4,4]."""
    poses = np.asarray(poses)
    segs = [
        generate_interpolated_path(poses[i:i + 2], n_interp)
        for i in range(len(poses) - 1)
    ]
    allp = np.concatenate(segs + [poses[-1:, :3, :4]], axis=0)
    out = np.tile(np.eye(4), (len(allp), 1, 1))
    out[:, :3, :4] = allp
    return out


def video_path_from_train_poses(poses_w2c, n_views, seconds=10, fps=30):
    """render.py:36-57: n_interp = int(seconds * fps / n_views) between
    each consecutive optimized pose. Returns [M,4,4] (same convention as
    the input poses)."""
    n_interp = int(seconds * fps / n_views)
    return interpolate_between_all(np.asarray(poses_w2c), n_interp)


def test_pose_init_from_train(extrinsics_w2c, n_test):
    """init_geo.py:86-113: spline-interpolate the train w2c extrinsics and
    linspace-sample n_test of them (or subsample directly when there are
    enough train views)."""
    extr = np.asarray(extrinsics_w2c)
    n_train = len(extr)
    if n_train < n_test:
        n_interp = (n_test // (n_train - 1)) + 1
        allp = interpolate_between_all(extr, n_interp)
        idx = np.linspace(0, len(allp) - 1, n_test, dtype=int)
        return allp[idx]
    idx = np.linspace(0, n_train - 1, n_test, dtype=int)
    return extr[idx]


# ---------------------------------------------------------------------------
# pose normalization + ellipse / spiral render paths
# (reference: utils/camera_utils.py:89-206, utils/pose_utils.py:302-417)
# ---------------------------------------------------------------------------


def pad_poses(p):
    bottom = np.broadcast_to([0, 0, 0, 1.0], p[..., :1, :4].shape)
    return np.concatenate([p[..., :3, :4], bottom], axis=-2)


def unpad_poses(p):
    return p[..., :3, :4]


def transform_poses_pca(poses):
    """Align principal components of camera centers with XYZ, scale into
    [-1, 1]^3 (utils/camera_utils.py:89-125). poses: [N,3,4] c2w."""
    poses = np.asarray(poses)[:, :3, :4]
    t = poses[:, :3, 3]
    t_mean = t.mean(axis=0)
    t = t - t_mean
    eigval, eigvec = np.linalg.eig(t.T @ t)
    inds = np.argsort(eigval)[::-1]
    eigvec = eigvec[:, inds]
    rot = eigvec.T
    if np.linalg.det(rot) < 0:
        rot = np.diag(np.array([1, 1, -1])) @ rot
    transform = np.concatenate([rot, rot @ -t_mean[:, None]], -1)
    poses_recentered = unpad_poses(transform @ pad_poses(poses))
    transform = np.concatenate([transform, np.eye(4)[3:]], axis=0)
    if poses_recentered.mean(axis=0)[2, 1] < 0:
        flip = np.diag(np.array([1, -1, -1]))
        poses_recentered = flip @ poses_recentered
        transform = np.diag(np.array([1, -1, -1, 1])) @ transform
    scale = 1.0 / np.max(np.abs(poses_recentered[:, :3, 3]))
    poses_recentered[:, :3, 3] *= scale
    transform = np.diag(np.array([scale] * 3 + [1])) @ transform
    return poses_recentered, transform


def focus_point_fn(poses):
    """Point minimizing distance to all camera z-axes (mip-NeRF 360)."""
    directions = poses[:, :3, 2:3]
    origins = poses[:, :3, 3:4]
    m = np.eye(3) - directions * np.transpose(directions, [0, 2, 1])
    mt_m = np.transpose(m, [0, 2, 1]) @ m
    return np.linalg.inv(mt_m.mean(0)) @ (mt_m @ origins).mean(0)[:, 0]


def generate_ellipse_path(c2w_poses, n_frames=600, const_speed=True,
                          z_variation=0.0, z_phase=0.0):
    """Elliptical orbit around the scene focus point
    (utils/pose_utils.py:302-366). c2w_poses: [N,4,4] (COLMAP convention);
    returns [n_frames, 4, 4] w2c matrices ready for rendering."""
    from instantsplat_tpu.utils.stepfun import sample_np

    # OpenGL-style pose set like the reference builds from Camera objects
    poses = np.asarray(c2w_poses).copy()
    poses[:, :, 1:3] *= -1
    poses, transform = transform_poses_pca(poses)

    center = focus_point_fn(poses)
    offset = np.array([center[0], center[1], 0])
    sc = np.percentile(np.abs(poses[:, :3, 3] - offset), 90, axis=0)
    low = -sc + offset
    high = sc + offset
    z_low = np.percentile(poses[:, :3, 3], 10, axis=0)
    z_high = np.percentile(poses[:, :3, 3], 90, axis=0)

    def get_positions(theta):
        return np.stack([
            low[0] + (high - low)[0] * (np.cos(theta) * 0.5 + 0.5),
            low[1] + (high - low)[1] * (np.sin(theta) * 0.5 + 0.5),
            z_variation * (z_low[2] + (z_high - z_low)[2]
                           * (np.cos(theta + 2 * np.pi * z_phase) * 0.5
                              + 0.5)),
        ], -1)

    theta = np.linspace(0, 2.0 * np.pi, n_frames + 1, endpoint=True)
    positions = get_positions(theta)
    if const_speed:
        lengths = np.linalg.norm(positions[1:] - positions[:-1], axis=-1)
        theta = sample_np(None, theta, np.log(np.maximum(lengths, 1e-12)),
                          n_frames + 1)
        positions = get_positions(theta)
    positions = positions[:-1]

    avg_up = poses[:, :3, 1].mean(0)
    avg_up = avg_up / np.linalg.norm(avg_up)
    ind_up = np.argmax(np.abs(avg_up))
    up = np.eye(3)[ind_up] * np.sign(avg_up[ind_up])

    render_w2c = []
    inv_tf = np.linalg.inv(transform)
    for p in positions:
        pose = np.eye(4)
        pose[:3] = viewmatrix(p - center, up, p)
        pose = inv_tf @ pose
        pose[:3, 1:3] *= -1
        render_w2c.append(np.linalg.inv(pose))
    return np.stack(render_w2c)


def generate_spiral_path(c2w_poses, bounds, n_frames=180, n_rots=2,
                         zrate=0.5):
    """Forward-facing spiral (utils/pose_utils.py:370-417 simplified to
    take [N,4,4] c2w + [N,2] near/far bounds). Returns [n_frames,4,4] w2c."""
    poses = np.asarray(c2w_poses).copy()[:, :3, :4]
    poses[:, :, 1:3] *= -1
    bounds = np.asarray(bounds)
    scale = 1.0 / (bounds.min() * 0.75)
    poses[:, :3, 3] *= scale
    bounds = bounds * scale
    poses, transform = transform_poses_pca(poses)

    close_depth, inf_depth = bounds.min() * 0.9, bounds.max() * 5.0
    dt = 0.75
    focal = 1 / ((1 - dt) / close_depth + dt / inf_depth)
    positions = poses[:, :3, 3]
    radii = np.concatenate(
        [np.percentile(np.abs(positions), 90, 0), [1.0]])

    cam2world = np.eye(4)
    cam2world[:3] = viewmatrix(
        poses[:, :3, 2].mean(0), poses[:, :3, 1].mean(0),
        positions.mean(0))
    up = poses[:, :3, 1].mean(0)
    render_w2c = []
    inv_tf = np.linalg.inv(transform)
    for theta in np.linspace(0, 2 * np.pi * n_rots, n_frames,
                             endpoint=False):
        t = radii * [np.cos(theta), -np.sin(theta),
                     -np.sin(theta * zrate), 1.0]
        position = (cam2world @ t)[:3]
        lookat = (cam2world @ [0, 0, -focal, 1.0])[:3]
        pose = np.eye(4)
        pose[:3] = viewmatrix(position - lookat, up, position)
        pose = inv_tf @ pose
        pose[:3, 1:3] *= -1
        pose[:3, 3] /= scale
        render_w2c.append(np.linalg.inv(pose))
    return np.stack(render_w2c)
