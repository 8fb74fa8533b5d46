"""Differentiable front-to-back alpha compositing of projected 2D Gaussians.

This module is the reference-semantics "oracle" compositor: a pure-jnp,
autodiff-differentiable implementation of the per-pixel loop that the
reference's CUDA tile rasterizer runs (diff-gaussian-rasterization forward;
call site gaussian_renderer/__init__.py:126-135). It reproduces the exact
compositing rules:

  for each Gaussian in global front-to-back depth order:
      alpha = min(0.99, opacity * exp(power)),  power = -1/2 d^T Conic d
      skip if power > 0 or alpha < 1/255
      stop (latched, per pixel) if T * (1 - alpha) < 1e-4
      C += color * alpha * T;  T *= (1 - alpha)
  out = C + T * background

TPU mapping: instead of a per-pixel scalar loop, we scan over depth-sorted
Gaussian chunks; each step evaluates an [P_pixels, G_chunk] falloff block on
the VPU and accumulates color via a [P, G] x [G, 3] matmul (MXU). The "early
stop" latch becomes a per-pixel carried `done` bit + in-chunk cumulative
masks, so the semantics (including which Gaussians are excluded) match the
sequential loop bit-for-bit in exact arithmetic.

The production path is the Pallas tile kernel (ops/rasterize_pallas.py) which
is validated against this oracle; this version remains the fallback for CPU
tests and arbitrary-shape debugging. O(N_gaussians * N_pixels) — no tile
binning — so use on small/medium scenes only.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

ALPHA_EPS = 1.0 / 255.0  # minimum contributing alpha
ALPHA_MAX = 0.99  # alpha clamp
LOG_TERM = jnp.log(1e-4)  # transmittance termination threshold


class CompositeOut(NamedTuple):
    rgb: jax.Array  # [H, W, 3]
    alpha: jax.Array  # [H, W] accumulated opacity (1 - T_final)
    depth: jax.Array  # [H, W] alpha-weighted expected depth (0 where empty)


def _pixel_coords(height: int, width: int, y_offset=0.0):
    """Pixel-center coordinates, CUDA convention: centers at integer coords.

    y_offset shifts the row index — used when compositing a row-block of a
    larger image (pixel-sharded rendering across a device mesh).
    """
    py = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0).reshape(-1)
    px = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1).reshape(-1)
    return px, py + y_offset


@functools.partial(
    jax.jit, static_argnames=("height", "width", "chunk", "with_depth")
)
def composite(
    mean2d: jax.Array,
    conic: jax.Array,
    log_opacity: jax.Array,
    colors: jax.Array,
    depth: jax.Array,
    valid: jax.Array,
    height: int,
    width: int,
    bg: Optional[jax.Array] = None,
    chunk: int = 256,
    with_depth: bool = True,
    y_offset=0.0,
) -> CompositeOut:
    """Composite depth-sorted Gaussians over the full image.

    Args (all per-Gaussian arrays MUST already be sorted front-to-back; use
    `sort_by_depth` below):
      mean2d: [N, 2] pixel-space centers.
      conic: [N, 3] inverse 2D covariance (a, b, c).
      log_opacity: [N] log of activated opacity.
      colors: [N, 3] RGB.
      depth: [N] view-space z (for the expected-depth map).
      valid: [N] bool — padded/culled entries contribute nothing.
      bg: [3] background color (default black).
    """
    n = mean2d.shape[0]
    n_pad = ((n + chunk - 1) // chunk) * chunk
    pad = n_pad - n

    def _pad(x, fill=0.0):
        cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg, constant_values=fill)

    mean2d = _pad(mean2d)
    conic = _pad(conic)
    log_opacity = jnp.where(_pad(valid, False), _pad(log_opacity), -jnp.inf)
    colors = _pad(colors)
    gdepth = _pad(depth)

    px, py = _pixel_coords(height, width, y_offset)
    n_pix = height * width

    steps = n_pad // chunk
    xs = (
        mean2d.reshape(steps, chunk, 2),
        conic.reshape(steps, chunk, 3),
        log_opacity.reshape(steps, chunk),
        colors.reshape(steps, chunk, 3),
        gdepth.reshape(steps, chunk),
    )

    @jax.checkpoint
    def body(carry, x):
        rgb, dep, logT, done = carry
        m2, cn, lo, col, gz = x
        # [P, G] falloff block — direct (dx, dy) form: no monomial
        # cancellation, exact oracle arithmetic.
        dx = px[:, None] - m2[None, :, 0]
        dy = py[:, None] - m2[None, :, 1]
        power = (
            -0.5 * (cn[None, :, 0] * dx * dx + cn[None, :, 2] * dy * dy)
            - cn[None, :, 1] * dx * dy
        )
        alpha = jnp.minimum(ALPHA_MAX, jnp.exp(power + lo[None, :]))
        alpha = jnp.where((power > 0) | (alpha < ALPHA_EPS), 0.0, alpha)
        l = jnp.log1p(-alpha)  # 0 where alpha == 0
        cum = jnp.cumsum(l, axis=1)  # inclusive, within chunk
        logT_post = logT[:, None] + cum
        fired = (alpha > 0) & (logT_post < LOG_TERM)
        done_seq = done[:, None] | (jnp.cumsum(fired.astype(jnp.int32), axis=1) > 0)
        contribute = (alpha > 0) & ~done_seq
        # T before Gaussian i: pre-latch, non-contributing j<i all have l=0.
        w = jnp.where(contribute, alpha * jnp.exp(logT_post - l), 0.0)
        rgb = rgb + w @ col
        if with_depth:
            dep = dep + w @ gz[:, None]
        logT = logT + jnp.sum(jnp.where(contribute, l, 0.0), axis=1)
        return (rgb, dep, logT, done_seq[:, -1]), None

    init = (
        jnp.zeros((n_pix, 3), jnp.float32),
        jnp.zeros((n_pix, 1), jnp.float32),
        jnp.zeros((n_pix,), jnp.float32),
        jnp.zeros((n_pix,), bool),
    )
    (rgb, dep, logT, _), _ = jax.lax.scan(body, init, xs)

    T_final = jnp.exp(logT)
    if bg is not None:
        rgb = rgb + T_final[:, None] * bg[None, :]
    out_alpha = 1.0 - T_final
    return CompositeOut(
        rgb=rgb.reshape(height, width, 3),
        alpha=out_alpha.reshape(height, width),
        depth=dep.reshape(height, width),
    )


def sort_by_depth(depth: jax.Array, valid: jax.Array):
    """Front-to-back ordering: argsort of view z with invalid pushed last.

    The reference sorts per 16x16 tile by (tile | depth) key; because the
    depth key is global per camera, a single global argsort yields the same
    within-tile order.
    """
    key = jnp.where(valid, depth, jnp.inf)
    return jnp.argsort(key)
