"""Camera model: pinhole intrinsics + pose, as a jit-friendly pytree.

Design notes vs the reference (scene/cameras.py:17-57):
- The reference caches GL-style `world_view_transform` / `projection_matrix` /
  `full_proj_transform` because its CUDA rasterizer consumes NDC matrices. Our
  rasterizer projects directly with (fx, fy, cx, cy) — mathematically identical
  but avoids the transposed-matrix conventions entirely, and keeps the pose in
  the autodiff graph as a [7] quat+trans vector rather than behind an identity
  viewmatrix hack (reference gaussian_renderer/__init__.py:55-90).
- znear/zfar defaults match scene/cameras.py:48-49 (0.01 / 100).
- H, W are static Python ints (XLA static shapes); everything else is traced.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from instantsplat_tpu.utils import transforms as T


def fov2focal(fov, pixels):
    """Reference: utils/graphics_utils.py:93-94."""
    return pixels / (2 * np.tan(fov / 2))


def focal2fov(focal, pixels):
    """Reference: utils/graphics_utils.py:96-97."""
    return 2 * np.arctan(pixels / (2 * focal))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """One pinhole camera.

    Fields:
      pose: [7] = [qw qx qy qz tx ty tz], world-to-camera (COLMAP convention;
            reference scene/cameras.py stores R/T of w2c and
            utils/pose_utils.py:57-84 decodes the same 7-vector).
      fx, fy, cx, cy: scalar intrinsics in pixels.
      height, width: static image size.
      image: optional [H, W, 3] ground-truth in [0, 1].
      uid: static camera id.
    """

    pose: jax.Array
    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    image: Optional[jax.Array] = None
    uid: jax.Array = dataclasses.field(default=0)  # data leaf so cameras stack
    height: int = dataclasses.field(default=0, metadata=dict(static=True))
    width: int = dataclasses.field(default=0, metadata=dict(static=True))
    znear: float = dataclasses.field(default=0.01, metadata=dict(static=True))
    zfar: float = dataclasses.field(default=100.0, metadata=dict(static=True))

    @classmethod
    def create(
        cls,
        R: np.ndarray,
        t: np.ndarray,
        fx: float,
        fy: float,
        height: int,
        width: int,
        image: Optional[np.ndarray] = None,
        cx: Optional[float] = None,
        cy: Optional[float] = None,
        uid: int = 0,
    ) -> "Camera":
        """Build from world-to-camera rotation R [3,3] and translation t [3]."""
        M = np.eye(4, dtype=np.float32)
        M[:3, :3] = np.asarray(R, np.float32)
        M[:3, 3] = np.asarray(t, np.float32)
        # numpy conversion: per-camera eager jnp here would pay a slow
        # tiny-op compile series over a remote-device tunnel at scene load.
        pose = jnp.asarray(T.matrix_to_pose_np(M))
        return cls(
            pose=pose,
            fx=jnp.float32(fx),
            fy=jnp.float32(fy),
            # default principal point matches the reference CUDA ndc2Pix
            # convention ((W-1)/2), not the COLMAP W/2 — COLMAP cx/cy are
            # discarded by the reference loader (scene/dataset_readers.py).
            cx=jnp.float32((width - 1) / 2 if cx is None else cx),
            cy=jnp.float32((height - 1) / 2 if cy is None else cy),
            image=None if image is None else jnp.asarray(image, jnp.float32),
            uid=jnp.int32(uid),
            height=int(height),
            width=int(width),
        )

    @property
    def w2c(self) -> jax.Array:
        return T.pose_to_matrix(self.pose)

    @property
    def c2w(self) -> jax.Array:
        return T.se3_inverse(self.w2c)

    @property
    def center(self) -> jax.Array:
        """Camera center in world coords (reference: scene/cameras.py:56-57)."""
        return self.c2w[..., :3, 3]

    @property
    def fovx(self):
        return 2 * jnp.arctan(self.width / (2 * self.fx))

    @property
    def fovy(self):
        return 2 * jnp.arctan(self.height / (2 * self.fy))

    def replace(self, **kw) -> "Camera":
        return dataclasses.replace(self, **kw)


def stack_cameras(cams: list[Camera]) -> Camera:
    """Stack same-resolution cameras into one batched Camera pytree ([V, ...]).

    The batched form is what jitted multi-view loops (training, test-time pose
    opt) scan/vmap over.
    """
    assert len({(c.height, c.width) for c in cams}) == 1, "resolutions must match"
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
