"""3D Gaussian -> 2D screen-space projection (EWA splatting), differentiable.

This is the geometry half of the rasterizer that the reference implements in
CUDA (diff-gaussian-rasterization's `computeCov2D`/`preprocessCUDA`; see
SURVEY.md §2.1). Semantics reproduced:

- view-space clamping of the EWA Jacobian footprint to 1.3 * tan(fov/2);
- cov2D = J W Sigma3D W^T J^T with the +0.3px low-pass filter on the diagonal;
- radius = ceil(3 * sqrt(max eigenvalue)) of cov2D;
- pixel centers: x_pix = fx * X/Z + cx with cx = (W-1)/2 matching the CUDA
  ndc2Pix convention;
- frustum cull at z <= 0.2 (the CUDA `in_frustum` near threshold).

Everything is batched over Gaussians and differentiable w.r.t. means,
covariances, AND the camera pose (the pose enters through R, t — this is how
InstantSplat backpropagates to poses; reference gaussian_renderer/__init__.py
:81-90 does it by pre-transforming points outside the CUDA kernel).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

NEAR_CULL_Z = 0.2  # CUDA rasterizer's in_frustum near plane
LOW_PASS = 0.3  # screen-space dilation added to cov2D diagonal


class ProjectedGaussians(NamedTuple):
    mean2d: jax.Array  # [N, 2] pixel coords
    cov2d: jax.Array  # [N, 3] upper-triangular (a, b, c) of 2x2 covariance
    conic: jax.Array  # [N, 3] inverse covariance (a, b, c)
    depth: jax.Array  # [N] view-space z
    radius: jax.Array  # [N] 3-sigma pixel radius (0 for culled)
    valid: jax.Array  # [N] bool: in frustum and non-degenerate


def project_gaussians(
    means3d: jax.Array,
    cov3d: jax.Array,
    R: jax.Array,
    t: jax.Array,
    fx,
    fy,
    cx,
    cy,
    width: int,
    height: int,
) -> ProjectedGaussians:
    """Project world-space Gaussians into one camera.

    Args:
      means3d: [N, 3] world centers.
      cov3d: [N, 3, 3] world covariance.
      R, t: world-to-camera rotation [3,3] / translation [3] (traced — pose
        gradients flow through these).
      fx, fy, cx, cy: intrinsics in pixels.
      width, height: static image size.
    """
    # view-space means: the pose-gradient path.
    t_view = means3d @ R.T + t  # [N, 3]
    z = t_view[:, 2]

    tan_fovx = width / (2.0 * fx)
    tan_fovy = height / (2.0 * fy)
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    txz = jnp.clip(t_view[:, 0] * inv_z, -limx, limx)
    tyz = jnp.clip(t_view[:, 1] * inv_z, -limy, limy)
    tx = txz * z
    ty = tyz * z

    # EWA Jacobian J (2x3) of the perspective projection at (tx, ty, z).
    j00 = fx * inv_z
    j02 = -fx * tx * inv_z * inv_z
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z * inv_z

    # M = J @ R (2x3): rows of the combined linearization.
    m0 = j00[:, None] * R[0] + j02[:, None] * R[2]  # [N, 3]
    m1 = j11[:, None] * R[1] + j12[:, None] * R[2]

    # cov2d = M Sigma M^T (2x2 symmetric; compute the three entries).
    s_m0 = jnp.einsum("nij,nj->ni", cov3d, m0)
    s_m1 = jnp.einsum("nij,nj->ni", cov3d, m1)
    a = jnp.sum(m0 * s_m0, axis=-1) + LOW_PASS
    b = jnp.sum(m0 * s_m1, axis=-1)
    c = jnp.sum(m1 * s_m1, axis=-1) + LOW_PASS

    det = a * c - b * b
    det_safe = jnp.where(det <= 0, 1.0, det)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    # 3-sigma radius from the larger eigenvalue.
    mid = 0.5 * (a + c)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam1))

    mean2d = jnp.stack(
        [fx * tx * inv_z + cx, fy * ty * inv_z + cy], axis=-1
    )

    in_front = z > NEAR_CULL_Z
    nondegenerate = det > 0
    on_screen = (
        (mean2d[:, 0] + radius > 0)
        & (mean2d[:, 0] - radius < width)
        & (mean2d[:, 1] + radius > 0)
        & (mean2d[:, 1] - radius < height)
    )
    valid = in_front & nondegenerate & on_screen
    radius = jnp.where(valid, radius, 0.0)
    return ProjectedGaussians(mean2d, jnp.stack([a, b, c], -1), conic, z, radius, valid)


def pack_pixel_features(mean2d: jax.Array, conic: jax.Array) -> jax.Array:
    """Fold (mean2d, conic) into per-Gaussian monomial coefficients g6 so that
    the Gaussian log-falloff at pixel p is a dot product:

        power(p) = [px^2, px*py, py^2, px, py, 1] . g6

    with power = -0.5 (p-mu)^T Conic (p-mu). This turns per-pixel falloff
    evaluation into a [P,6]x[6,G] matmul — the MXU-native formulation of the
    CUDA per-pixel loop (see SURVEY.md §7 hard parts; the compositor consumes
    these).
    """
    A, B, C = conic[:, 0], conic[:, 1], conic[:, 2]
    mx, my = mean2d[:, 0], mean2d[:, 1]
    return jnp.stack(
        [
            -0.5 * A,
            -B,
            -0.5 * C,
            A * mx + B * my,
            B * mx + C * my,
            -(0.5 * A * mx * mx + B * mx * my + 0.5 * C * my * my),
        ],
        axis=-1,
    )
