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
