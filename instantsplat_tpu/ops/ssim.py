"""Differentiable SSIM.

TPU-native replacement for both the reference's `fused-ssim` CUDA extension
(train.py:40-43) and its pure-torch fallback (utils/loss_utils.py:55-85).
Formula parity: 11x11 Gaussian window with sigma=1.5, C1=0.01^2, C2=0.03^2.

Implementation: the Gaussian window is separable, so the five local moments
(mu_x, mu_y, E[x^2], E[y^2], E[xy]) are computed with two 1-D blurs each.
Each 1-D blur is expressed as 11 shifted slices scaled by the window taps —
pure VPU FMAs that XLA fuses into one vector loop. (The earlier depthwise
`conv_general_dilated` formulation lowered to grouped convolutions that the
TPU backend executes far from peak at C=3; the shifted-add form measured
~2 ms faster per train iteration at 384x512.) Forward AND backward are plain
autodiff through the same graph.

Boundary semantics match torch's conv2d with padding=window_size//2
(zero-padded 'SAME'), i.e. the reference `ssim`/`fused_ssim` behavior.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    """1D normalized Gaussian (reference: utils/loss_utils.py:39-42)."""
    xs = np.arange(window_size, dtype=np.float64)
    g = np.exp(-((xs - window_size // 2) ** 2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _blur_axis(x: jax.Array, win: np.ndarray, axis: int) -> jax.Array:
    """1-D 'SAME' zero-padded blur along `axis` as shifted-slice FMAs."""
    k = win.shape[0]
    pad = k // 2
    size = x.shape[axis]
    cfg = [(pad, pad) if i == axis else (0, 0) for i in range(x.ndim)]
    xp = jnp.pad(x, cfg)
    out = None
    for i in range(k):
        term = float(win[i]) * jax.lax.slice_in_dim(xp, i, i + size, axis=axis)
        out = term if out is None else out + term
    return out


def _blur(img: jax.Array, win: np.ndarray) -> jax.Array:
    """Separable Gaussian blur. img: [C, H, W], zero 'SAME' padding."""
    return _blur_axis(_blur_axis(img, win, 1), win, 2)


def ssim(
    img1: jax.Array,
    img2: jax.Array,
    window_size: int = 11,
    sigma: float = 1.5,
    c1: float = 0.01**2,
    c2: float = 0.03**2,
) -> jax.Array:
    """Mean SSIM between two images.

    Args:
      img1, img2: [H, W, C] or [C, H, W]-agnostic — internally treated as
        [C, H, W]; pass channels-last and we transpose.

    Returns scalar mean SSIM (reference: utils/loss_utils.py:65-85 with
    size_average=True).
    """
    if img1.ndim != 3:
        raise ValueError(f"expected 3D image, got {img1.shape}")
    # accept [H, W, C] (our native layout); convert to [C, H, W]
    if img1.shape[-1] in (1, 3) and img1.shape[0] not in (1, 3):
        img1 = img1.transpose(2, 0, 1)
        img2 = img2.transpose(2, 0, 1)

    win = _gaussian_window(window_size, sigma)
    mu1 = _blur(img1, win)
    mu2 = _blur(img2, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _blur(img1 * img1, win) - mu1_sq
    sigma2_sq = _blur(img2 * img2, win) - mu2_sq
    sigma12 = _blur(img1 * img2, win) - mu1_mu2

    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map)


def masked_ssim(img1: jax.Array, img2: jax.Array, mask: jax.Array) -> jax.Array:
    """SSIM averaged over masked pixels (reference: utils/loss_utils.py:25-37).

    mask: [H, W] boolean/float; applied to the SSIM map before averaging.
    """
    if img1.shape[-1] in (1, 3) and img1.shape[0] not in (1, 3):
        img1 = img1.transpose(2, 0, 1)
        img2 = img2.transpose(2, 0, 1)
    win = _gaussian_window(11, 1.5)
    mu1, mu2 = _blur(img1, win), _blur(img2, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _blur(img1 * img1, win) - mu1_sq
    s2 = _blur(img2 * img2, win) - mu2_sq
    s12 = _blur(img1 * img2, win) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    m = mask[None].astype(ssim_map.dtype)
    n_ch = ssim_map.shape[0]
    return jnp.sum(ssim_map * m) / jnp.maximum(jnp.sum(m) * n_ch, 1.0)
