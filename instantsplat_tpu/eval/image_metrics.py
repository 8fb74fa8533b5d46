"""Image quality metrics: PSNR, SSIM, LPIPS(vgg) in JAX.

PSNR/SSIM reuse the training-loss implementations (ops/losses.py — same
formulas as the reference utils/image_utils.py:14-19 and
utils/loss_utils.py:55-85).

LPIPS reproduces the reference lpipsPyTorch module exactly
(lpipsPyTorch/modules/{lpips,networks,utils}.py): z-score the inputs with
the LPIPS shift/scale constants, run the VGG16 feature trunk, take
activations at relu1_2/2_2/3_3/4_3/5_3 (torchvision feature indices
[4, 9, 16, 23, 30]), channel-unit-normalize, square the difference, apply
the learned 1x1 linear heads, spatial-mean, and sum over stages. The
reference is called with images in [0, 1] (metrics.py:66-72), and so is
this.

Weights: this environment has no network egress and no cached torchvision/
LPIPS checkpoints, so `LpipsVGG.from_torch_files` converts user-provided
torch checkpoints (vgg16 IMAGENET1K_V1 features + richzhang v0.1 vgg.pth
lin weights) into the JAX pytree, and `lpips()` raises a clear error when
no weights are available. Pipelines report `LPIPS: null` in that case.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from instantsplat_tpu.ops.losses import psnr, ssim  # noqa: F401 (re-export)

# VGG16 feature-extractor conv plan up to relu5_3: (out_channels, pool?)
_VGG_PLAN = [
    (64, False), (64, True),
    (128, False), (128, True),
    (256, False), (256, False), (256, True),
    (512, False), (512, False), (512, True),
    (512, False), (512, False), (512, False),
]
# conv indices (0-based into _VGG_PLAN) after which a target relu is tapped
_TAPS = [1, 3, 6, 9, 12]
_N_CHANNELS = [64, 128, 256, 512, 512]
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


@dataclasses.dataclass(frozen=True)
class LpipsVGG:
    """Parameter pytree: VGG conv stack + LPIPS linear heads."""

    conv_w: tuple  # [k,k,cin,cout] per conv
    conv_b: tuple
    lin_w: tuple  # [1,1,c,1] per tap

    @classmethod
    def from_torch_files(cls, vgg_path, lin_path):
        """Convert torchvision vgg16 features + richzhang v0.1 vgg.pth."""
        import torch

        vgg_sd = torch.load(vgg_path, map_location="cpu", weights_only=True)
        if hasattr(vgg_sd, "state_dict"):
            vgg_sd = vgg_sd.state_dict()
        # torchvision layout: features.<idx>.weight — conv indices in the
        # Sequential are 0,2,5,7,10,12,14,17,19,21,24,26,28
        feat_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
        conv_w, conv_b = [], []
        for li in feat_idx:
            for key in (f"features.{li}.weight", f"{li}.weight"):
                if key in vgg_sd:
                    w = vgg_sd[key].numpy()
                    b = vgg_sd[key.replace("weight", "bias")].numpy()
                    break
            else:
                raise KeyError(f"vgg conv {li} not found in {vgg_path}")
            conv_w.append(jnp.asarray(w.transpose(2, 3, 1, 0)))  # HWIO
            conv_b.append(jnp.asarray(b))
        lin_sd = torch.load(lin_path, map_location="cpu", weights_only=True)
        lin_w = []
        for i in range(5):
            for key in (f"lin{i}.model.1.weight", f"{i}.1.weight",
                        f"lin.{i}.1.weight"):
                if key in lin_sd:
                    lin_w.append(jnp.asarray(
                        lin_sd[key].numpy().transpose(2, 3, 1, 0)))
                    break
            else:
                raise KeyError(f"lin head {i} not found in {lin_path}")
        return cls(tuple(conv_w), tuple(conv_b), tuple(lin_w))

    @classmethod
    def random(cls, seed=0):
        """Random-weight instance (architecture/shape tests only)."""
        rng = np.random.default_rng(seed)
        conv_w, conv_b = [], []
        cin = 3
        for cout, _ in _VGG_PLAN:
            conv_w.append(jnp.asarray(
                rng.standard_normal((3, 3, cin, cout)).astype(np.float32)
                * np.sqrt(2.0 / (9 * cin))))
            conv_b.append(jnp.zeros(cout, jnp.float32))
            cin = cout
        lin_w = tuple(
            jnp.asarray(rng.random((1, 1, c, 1)).astype(np.float32))
            for c in _N_CHANNELS
        )
        return cls(tuple(conv_w), tuple(conv_b), lin_w)


jax.tree_util.register_pytree_node(
    LpipsVGG,
    lambda p: ((p.conv_w, p.conv_b, p.lin_w), None),
    lambda _, c: LpipsVGG(*c),
)


def _vgg_features(params: LpipsVGG, x):
    """x [N,H,W,3] z-scored input -> list of unit-normalized tap features."""
    out = []
    h = x
    for i, (w, b) in enumerate(zip(params.conv_w, params.conv_b)):
        h = jax.lax.conv_general_dilated(
            h, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = jax.nn.relu(h + b)
        if i in _TAPS:
            norm = jnp.sqrt(jnp.sum(h * h, axis=-1, keepdims=True))
            out.append(h / (norm + 1e-10))
        if _VGG_PLAN[i][1]:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID")
    return out


@jax.jit
def lpips_pair(params: LpipsVGG, x, y):
    """LPIPS distance between [H,W,3] images in [0,1] (vgg net)."""
    x = (x[None] - _SHIFT) / _SCALE
    y = (y[None] - _SHIFT) / _SCALE
    fx = _vgg_features(params, x)
    fy = _vgg_features(params, y)
    total = 0.0
    for a, b, w in zip(fx, fy, params.lin_w):
        d = (a - b) ** 2
        val = jax.lax.conv_general_dilated(
            d, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        total = total + jnp.mean(val, axis=(1, 2, 3))
    return total[0]


_DEFAULT: Optional[LpipsVGG] = None


def set_default_lpips(params: Optional[LpipsVGG]):
    global _DEFAULT
    _DEFAULT = params


def lpips(x, y, params: Optional[LpipsVGG] = None):
    params = params if params is not None else _DEFAULT
    if params is None:
        raise RuntimeError(
            "LPIPS weights unavailable: no network egress and no cached "
            "checkpoint in this environment. Provide converted weights via "
            "LpipsVGG.from_torch_files(...) / set_default_lpips(...)."
        )
    return lpips_pair(params, jnp.asarray(x), jnp.asarray(y))
