"""3D Gaussian scene representation as a functional parameter pytree.

TPU-native re-design of the reference `GaussianModel`
(scene/gaussian_model.py): instead of a stateful torch.nn.Module with an
embedded optimizer, the scene is an immutable pytree of raw (pre-activation)
parameters that flows through jit/grad, with activations applied functionally.

Parity anchors:
- activations (scene/gaussian_model.py:31-46 `setup_functions`):
  scaling = exp(_scaling), opacity = sigmoid(_opacity), rotation = normalized
  quaternion, covariance = R S S^T R^T built from scaling+rotation;
- creation from a point cloud (scene/gaussian_model.py:146-172
  `create_from_pcd`): colors -> DC SH, extra SH bands zero, scales from
  log(sqrt(mean 3-NN squared distance)), identity rotations, opacity
  inverse_sigmoid(0.1);
- learnable per-sequence camera poses `P` [V, 7]
  (scene/gaussian_model.py:126-140 `init_RT_seq`/`get_RT`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from instantsplat_tpu.ops.knn import mean_knn_dist2
from instantsplat_tpu.utils import sh as SH
from instantsplat_tpu.utils import transforms as T


def inverse_sigmoid(x):
    """Reference: utils/general_utils.py:18."""
    return jnp.log(x / (1 - x))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianModel:
    """Raw (pre-activation) Gaussian parameters + learnable camera poses.

    Fields (N Gaussians, V training views, max SH degree D):
      xyz:           [N, 3]   world-space centers
      features_dc:   [N, 1, 3]  SH DC coefficients
      features_rest: [N, (D+1)^2 - 1, 3]  higher-order SH coefficients
      scaling:       [N, 3]   log-scales
      rotation:      [N, 4]   unnormalized wxyz quaternions
      opacity:       [N, 1]   logit opacities
      cam_poses:     [V, 7]   per-view w2c [quat, trans] (jointly optimized)
      max_sh_degree: static.
    """

    xyz: jax.Array
    features_dc: jax.Array
    features_rest: jax.Array
    scaling: jax.Array
    rotation: jax.Array
    opacity: jax.Array
    cam_poses: jax.Array
    max_sh_degree: int = dataclasses.field(default=3, metadata=dict(static=True))

    # ---- derived (activated) quantities -------------------------------

    @property
    def num_points(self) -> int:
        return self.xyz.shape[0]

    @property
    def num_views(self) -> int:
        return self.cam_poses.shape[0]

    def get_scaling(self) -> jax.Array:
        return jnp.exp(self.scaling)

    def get_opacity(self) -> jax.Array:
        return jax.nn.sigmoid(self.opacity)

    def get_rotation(self) -> jax.Array:
        return T.quat_normalize(self.rotation)

    def get_features(self) -> jax.Array:
        """[N, (D+1)^2, 3] full SH coefficient stack."""
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)

    def get_pose(self, uid) -> jax.Array:
        """Learnable pose for view `uid` (reference get_RT,
        scene/gaussian_model.py:134-137)."""
        return self.cam_poses[uid]

    def get_covariance(self, scale_modifier: float = 1.0) -> jax.Array:
        """World-space 3x3 covariance per Gaussian: (R S)(R S)^T.

        Reference: scene/gaussian_model.py:40-42 +
        utils/general_utils.py:101-110 `build_scaling_rotation`.
        """
        R = T.quat_to_rotmat(self.get_rotation())  # [N,3,3]
        S = self.get_scaling() * scale_modifier  # [N,3]
        L = R * S[:, None, :]  # R @ diag(S)
        return L @ jnp.swapaxes(L, -1, -2)

    def replace(self, **kw) -> "GaussianModel":
        return dataclasses.replace(self, **kw)

    # ---- construction ---------------------------------------------------

    @classmethod
    def create_from_pcd(
        cls,
        points: np.ndarray,
        colors: np.ndarray,
        cam_poses: Optional[jax.Array] = None,
        max_sh_degree: int = 3,
        init_opacity: float = 0.1,
        scale_override: Optional[np.ndarray] = None,
    ) -> "GaussianModel":
        """Initialize from a colored point cloud.

        Matches scene/gaussian_model.py:146-172: DC SH from RGB, zero rest,
        per-point isotropic log-scale from sqrt(mean 3-NN dist^2) (or the
        per-view-depth override used with --init_scale_from_view_depth,
        scene/__init__.py:88-93), identity rotation, opacity 0.1.
        """
        pts = jnp.asarray(points, jnp.float32)
        n = pts.shape[0]
        fused_color = SH.rgb_to_sh(jnp.asarray(colors, jnp.float32))
        k = SH.num_sh_coeffs(max_sh_degree)
        features_dc = fused_color[:, None, :]
        features_rest = jnp.zeros((n, k - 1, 3), jnp.float32)
        if scale_override is not None:
            scales = jnp.log(jnp.asarray(scale_override, jnp.float32))[:, None].repeat(3, 1)
        else:
            dist2 = mean_knn_dist2(pts, k=3)
            scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, 1)
        rots = jnp.zeros((n, 4), jnp.float32).at[:, 0].set(1.0)
        opacities = inverse_sigmoid(init_opacity * jnp.ones((n, 1), jnp.float32))
        if cam_poses is None:
            cam_poses = jnp.zeros((0, 7), jnp.float32)
        return cls(
            xyz=pts,
            features_dc=features_dc,
            features_rest=features_rest,
            scaling=scales,
            rotation=rots,
            opacity=opacities,
            cam_poses=jnp.asarray(cam_poses, jnp.float32),
            max_sh_degree=max_sh_degree,
        )

    @classmethod
    def init_cam_poses_from_w2c(cls, w2c_list) -> jax.Array:
        """[V,4,4] (or list) world-to-camera matrices -> [V,7] pose params
        (reference init_RT_seq, scene/gaussian_model.py:126-132)."""
        M = np.stack([np.asarray(m) for m in w2c_list])
        # host-side conversion (see transforms.matrix_to_pose_np docstring)
        return jnp.asarray(T.matrix_to_pose_np(M))
