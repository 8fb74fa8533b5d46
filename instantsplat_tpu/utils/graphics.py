"""Graphics helpers: GL-convention matrices + depth-based scale init.

API-parity helpers from the reference utils/graphics_utils.py. Our
renderer consumes (fx, fy, cx, cy) directly, so the GL matrices exist for
interop (viewer protocol, exported cameras.json consumers), and
`scale_from_view_depth` backs the --init_scale_from_view_depth flag
(graphics_utils.py:107-135 + scene/__init__.py:86-95).
"""

from __future__ import annotations

import numpy as np


def get_world2view2(R, t, translate=np.zeros(3), scale=1.0):
    """GL-style w2c with optional recentering (graphics_utils.py:38-49).

    NOTE the reference convention: R is stored TRANSPOSED (c2w rotation)
    and t is the w2c translation — kept verbatim for interop.
    """
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = np.asarray(R).T
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    C2W = np.linalg.inv(Rt)
    C2W[:3, 3] = (C2W[:3, 3] + translate) * scale
    return np.linalg.inv(C2W).astype(np.float32)


def get_projection_matrix(znear, zfar, fovx, fovy):
    """Perspective projection (graphics_utils.py:71-91), row-major."""
    tan_y = np.tan(fovy / 2)
    tan_x = np.tan(fovx / 2)
    top, right = tan_y * znear, tan_x * znear
    P = np.zeros((4, 4))
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P.astype(np.float32)


def scale_from_view_depth(points, w2c_mats, focals):
    """Per-point Gaussian scale from projected view depth
    (compute_scale_gaussian_by_project_pair_pcd, graphics_utils.py:107-135):
    depth of each point = min over training views of its camera-frame z,
    clipped to >= 0.01; scale = depth / mean focal (the size one pixel
    subtends at that depth).

    points [N,3]; w2c_mats [V,4,4]; focals [V, 2] (fx, fy) or [V].
    """
    points = np.asarray(points)
    depths = []
    for w2c in np.asarray(w2c_mats):
        z = points @ w2c[:3, 2] + w2c[2, 3]
        depths.append(z)
    depth = np.min(np.stack(depths), axis=0)
    depth = np.clip(depth, 0.01, depth.max())
    f = np.asarray(focals, np.float64)
    mean_f = float(f.mean())
    return depth / mean_f
