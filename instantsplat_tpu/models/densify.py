"""Densification / pruning machinery for adaptive Gaussian control.

Functional equivalents of the reference's dormant density control
(scene/gaussian_model.py:328-478). InstantSplat keeps the point count
fixed — the clone/split calls are commented out (train.py:196-206,
gaussian_model.py:460-474 runs only the prune) — but the machinery is part
of the model family's API surface, so it is provided in full:

- `densify_and_clone` (gaussian_model.py:416-428): duplicate Gaussians
  with large view-space positional gradients and small world scale;
- `densify_and_split` (gaussian_model.py:391-414): replace large
  high-gradient Gaussians with N=2 samples drawn from their own
  distribution, scales divided by 1.6;
- `prune_points` (gaussian_model.py:354-374): drop by min opacity /
  screen radius / world-size thresholds;
- `reset_opacity` (gaussian_model.py:279-283): clamp opacity to <= 0.01.

JAX note: these change N, so each call returns fresh (params, opt_state)
arrays with a NEW leading dimension — downstream jits recompile once per
densification event, exactly like re-allocating optimizer tensors does in
the reference (replace_tensor_to_optimizer / cat_tensors_to_optimizer).
Optimizer moments for surviving points are preserved; new points start
with zero moments (matching the reference's padding with zeros).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from instantsplat_tpu.models.gaussians import GaussianModel, inverse_sigmoid
from instantsplat_tpu.opt.gaussian_opt import AdamState
from instantsplat_tpu.utils import transforms as T


def _select(params: GaussianModel, state: AdamState, mask_or_idx):
    """Gather point rows of params + moments (cam_poses untouched)."""

    def take(x):
        return x[mask_or_idx]

    point_fields = ["xyz", "features_dc", "features_rest", "scaling",
                    "rotation", "opacity"]
    new_p = {f: take(getattr(params, f)) for f in point_fields}
    new_m = {f: take(getattr(state.m, f)) for f in point_fields}
    new_v = {f: take(getattr(state.v, f)) for f in point_fields}
    ppl = state.per_point_lr
    if ppl is not None:
        ppl = ppl[mask_or_idx]
    return (
        params.replace(**new_p),
        AdamState(m=state.m.replace(**new_m), v=state.v.replace(**new_v),
                  step=state.step, per_point_lr=ppl),
    )


def _concat(params: GaussianModel, state: AdamState, new_points: dict):
    """Append new points with zero optimizer moments."""
    point_fields = ["xyz", "features_dc", "features_rest", "scaling",
                    "rotation", "opacity"]
    new_p, new_m, new_v = {}, {}, {}
    for f in point_fields:
        old = getattr(params, f)
        add = new_points[f]
        new_p[f] = jnp.concatenate([old, add], 0)
        new_m[f] = jnp.concatenate(
            [getattr(state.m, f), jnp.zeros_like(add)], 0)
        new_v[f] = jnp.concatenate(
            [getattr(state.v, f), jnp.zeros_like(add)], 0)
    ppl = state.per_point_lr
    if ppl is not None:
        ppl = jnp.concatenate(
            [ppl, jnp.ones((len(new_points["xyz"]), 1), ppl.dtype)], 0)
    return (
        params.replace(**new_p),
        AdamState(m=state.m.replace(**new_m), v=state.v.replace(**new_v),
                  step=state.step, per_point_lr=ppl),
    )


def accumulate_grad_stats(xyz_gradient_accum, denom, mean2d_grad, visible):
    """Running mean of view-space positional gradient norms
    (gaussian_model.py:337-341 add_densification_stats)."""
    gnorm = jnp.linalg.norm(mean2d_grad, axis=-1)
    xyz_gradient_accum = xyz_gradient_accum + jnp.where(visible, gnorm, 0.0)
    denom = denom + visible.astype(jnp.float32)
    return xyz_gradient_accum, denom


def densify_and_clone(params, state, grads_mean, grad_threshold, extent,
                      percent_dense=0.01):
    """Duplicate small high-gradient Gaussians (gaussian_model.py:416-428)."""
    scale_max = jnp.max(params.get_scaling(), axis=-1)
    mask = (grads_mean >= grad_threshold) & (
        scale_max <= percent_dense * extent)
    mask_np = np.asarray(mask)
    if not mask_np.any():
        return params, state
    idx = np.nonzero(mask_np)[0]
    point_fields = ["xyz", "features_dc", "features_rest", "scaling",
                    "rotation", "opacity"]
    clones = {f: getattr(params, f)[idx] for f in point_fields}
    return _concat(params, state, clones)


def densify_and_split(params, state, grads_mean, grad_threshold, extent,
                      percent_dense=0.01, n_split=2, seed=0):
    """Split large high-gradient Gaussians into n samples drawn from their
    own covariance, scales /1.6, originals pruned
    (gaussian_model.py:391-414)."""
    scale_max = jnp.max(params.get_scaling(), axis=-1)
    mask = (grads_mean >= grad_threshold) & (
        scale_max > percent_dense * extent)
    mask_np = np.asarray(mask)
    if not mask_np.any():
        return params, state
    idx = np.nonzero(mask_np)[0]

    stds = params.get_scaling()[idx]  # [K, 3]
    rots = T.quat_to_rotmat(params.get_rotation()[idx])  # [K, 3, 3]
    key = jax.random.PRNGKey(seed)
    samples = jax.random.normal(
        key, (n_split, len(idx), 3)) * stds[None]
    new_xyz = (
        jnp.einsum("kij,nkj->nki", rots, samples)
        + params.xyz[idx][None]
    ).reshape(-1, 3)
    rep = lambda x: jnp.tile(  # noqa: E731
        x[idx], (n_split,) + (1,) * (x.ndim - 1))
    new = {
        "xyz": new_xyz,
        "features_dc": rep(params.features_dc),
        "features_rest": rep(params.features_rest),
        "scaling": jnp.log(
            jnp.tile(stds, (n_split, 1)) / (0.8 * n_split)),
        "rotation": rep(params.rotation),
        "opacity": rep(params.opacity),
    }
    params, state = _concat(params, state, new)
    # prune the originals (keep everything else + the new samples)
    n_total = params.num_points
    keep = np.ones(n_total, bool)
    keep[idx] = False
    return _select(params, state, np.nonzero(keep)[0])


def prune_points(params, state, min_opacity=0.005, extent=None,
                 max_screen_size=None, radii=None):
    """Drop low-opacity / oversized Gaussians (gaussian_model.py:460-474
  densify_and_prune's prune step — the only part InstantSplat runs)."""
    prune = np.asarray(params.get_opacity()[:, 0] < min_opacity)
    if max_screen_size is not None and radii is not None:
        prune |= np.asarray(radii) > max_screen_size
        prune |= np.asarray(
            jnp.max(params.get_scaling(), -1)) > 0.1 * extent
    keep = np.nonzero(~prune)[0]
    if len(keep) == params.num_points:
        return params, state
    return _select(params, state, keep)


def reset_opacity(params: GaussianModel):
    """opacity <- inverse_sigmoid(min(opacity, 0.01))
    (gaussian_model.py:279-283)."""
    new = inverse_sigmoid(
        jnp.minimum(params.get_opacity(), 0.01))
    return params.replace(opacity=new)
