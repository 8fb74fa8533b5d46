"""Photometric losses for joint Gaussian + pose optimization.

Parity: train.py:171-176 — loss = (1 - lambda_dssim) * L1 + lambda_dssim *
(1 - SSIM) with lambda_dssim = 0.2 (arguments/__init__.py:85). L1/L2/masked
variants per utils/loss_utils.py:17-23.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from instantsplat_tpu.ops.ssim import masked_ssim, ssim


def l1_loss(pred: jax.Array, gt: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred - gt))


def l2_loss(pred: jax.Array, gt: jax.Array) -> jax.Array:
    return jnp.mean((pred - gt) ** 2)


def masked_l1_loss(pred: jax.Array, gt: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean |pred-gt| over pixels where mask is true
    (reference utils/loss_utils.py:20-23, used by test-time pose opt,
    render.py:138-143)."""
    m = mask.astype(pred.dtype)
    if m.ndim == pred.ndim - 1:
        m = m[..., None]
    diff = jnp.abs(pred - gt) * m
    return jnp.sum(diff) / jnp.maximum(jnp.sum(jnp.broadcast_to(m, pred.shape)), 1.0)


def photometric_loss(
    pred: jax.Array, gt: jax.Array, lambda_dssim: float = 0.2
) -> tuple[jax.Array, dict]:
    """0.8*L1 + 0.2*(1-SSIM); returns (loss, aux dict with components)."""
    l1 = l1_loss(pred, gt)
    s = ssim(pred, gt)
    loss = (1.0 - lambda_dssim) * l1 + lambda_dssim * (1.0 - s)
    return loss, {"l1": l1, "ssim": s}


def masked_photometric_loss(
    pred: jax.Array, gt: jax.Array, mask: jax.Array, lambda_dssim: float = 0.2
) -> tuple[jax.Array, dict]:
    l1 = masked_l1_loss(pred, gt, mask)
    s = masked_ssim(pred, gt, mask)
    loss = (1.0 - lambda_dssim) * l1 + lambda_dssim * (1.0 - s)
    return loss, {"l1": l1, "ssim": s}


def psnr(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Reference: utils/image_utils.py:14-19 (per-image MSE over all pixels)."""
    mse = jnp.mean((pred - gt) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))
