"""Grouped Adam / per-point Adam for joint Gaussian + pose optimization.

Functional (optax-style) re-design of the reference's optimizer wiring:

- per-group learning rates with the reference's exact multipliers
  (scene/gaussian_model.py:174-200 `training_setup`): xyz scheduled
  (exponential log-lerp), f_dc = feature_lr*10, f_rest = feature_lr/2,
  opacity_lr, scaling_lr*10, rotation_lr*10, pose scheduled from
  rotation_lr*0.1 to rotation_lr*0.001;
- Adam eps = 1e-15 (scene/gaussian_model.py:191,221);
- the PerPointAdam variant (scene/per_point_adam.py:34-98): a per-point LR
  multiplier vector on xyz derived from MASt3R confidence
  (train.py:63-85: lr = (1 - sigmoid(conf)) * (max - min) + min, scale
  (1, 100) at train.py:96), and moment updates skipped when the
  whole-tensor grad norm is zero (per_point_adam.py:65-73). The
  reference's "self-adjusting" LR (per_point_adam.py:26-32) updates a
  local that is never written back — effectively a no-op — and is matched
  as such (see the inline note in `step`).

On TPU the whole update is one fused elementwise XLA graph over the
parameter pytree inside the jitted train step — there is no kernel launch
per tensor to optimize away, which is what made the reference reach for a
custom optimizer class.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from instantsplat_tpu.models.gaussians import GaussianModel
from instantsplat_tpu.utils.schedules import expon_lr


@dataclasses.dataclass(frozen=True)
class OptimizationConfig:
    """Reference defaults: arguments/__init__.py:73-94 (OptimizationParams)."""

    iterations: int = 30_000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.0002
    random_background: bool = False
    pp_optimizer: bool = False
    optim_pose: bool = False  # store_true flag; run scripts pass --optim_pose
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-15


def confidence_to_lr(confidence, scale=(1.0, 100.0)):
    """MASt3R per-point confidence -> per-point LR multiplier.

    Reference: train.py:63-85 `load_and_prepare_confidence` with
    scale=(1, 100) at train.py:96.
    """
    conf = jnp.asarray(confidence, jnp.float32)
    inverted = 1.0 - jax.nn.sigmoid(conf)
    lo, hi = scale
    return inverted * (hi - lo) + lo


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AdamState:
    m: GaussianModel
    v: GaussianModel
    step: jax.Array  # int32 scalar
    per_point_lr: Optional[jax.Array]  # [N, 1] or None (static None)


class GaussianOptimizer:
    """Per-group (+ optional per-point) Adam over a GaussianModel pytree.

    Pure-functional: `init` builds state, `step` maps
    (params, grads, state, iteration) -> (params, state). Everything inside
    `step` is traceable, so it lives inside the jitted train step.
    """

    def __init__(
        self,
        cfg: OptimizationConfig,
        spatial_lr_scale: float = 1.0,
        total_iterations: Optional[int] = None,
    ):
        self.cfg = cfg
        self.spatial_lr_scale = float(spatial_lr_scale)
        total = total_iterations if total_iterations is not None else cfg.iterations
        self.xyz_sched = expon_lr(
            lr_init=cfg.position_lr_init * self.spatial_lr_scale,
            lr_final=cfg.position_lr_final * self.spatial_lr_scale,
            lr_delay_mult=cfg.position_lr_delay_mult,
            max_steps=cfg.position_lr_max_steps,
        )
        self.pose_sched = expon_lr(
            lr_init=cfg.rotation_lr * 0.1,
            lr_final=cfg.rotation_lr * 0.001,
            lr_delay_mult=cfg.position_lr_delay_mult,
            max_steps=total,
        )

    # group LRs at `iteration` (traced) — reference multipliers, see module doc
    def group_lrs(self, iteration):
        cfg = self.cfg
        return dict(
            xyz=self.xyz_sched(iteration),
            features_dc=cfg.feature_lr * 10.0,
            features_rest=cfg.feature_lr / 20.0 * 10.0,
            opacity=cfg.opacity_lr,
            scaling=cfg.scaling_lr * 10.0,
            rotation=cfg.rotation_lr * 10.0,
            cam_poses=self.pose_sched(iteration) if cfg.optim_pose else 0.0,
        )

    def init(self, params: GaussianModel, confidence_lr=None) -> AdamState:
        zeros = jax.tree.map(jnp.zeros_like, params)
        ppl = None
        if self.cfg.pp_optimizer:
            if confidence_lr is None:
                ppl = jnp.ones((params.num_points, 1), jnp.float32)
            else:
                ppl = jnp.asarray(confidence_lr, jnp.float32).reshape(-1, 1)
        return AdamState(m=zeros, v=zeros, step=jnp.int32(0), per_point_lr=ppl)

    def step(
        self,
        params: GaussianModel,
        grads: GaussianModel,
        state: AdamState,
        iteration,
    ) -> tuple[GaussianModel, AdamState]:
        cfg = self.cfg
        t = state.step + 1
        bc1 = 1.0 - cfg.beta1 ** t.astype(jnp.float32)
        bc2 = 1.0 - cfg.beta2 ** t.astype(jnp.float32)
        lrs = self.group_lrs(iteration)

        new_p, new_m, new_v = {}, {}, {}
        new_ppl = state.per_point_lr
        for f in dataclasses.fields(GaussianModel):
            name = f.name
            if f.metadata.get("static"):
                continue
            p = getattr(params, name)
            g = getattr(grads, name)
            m = cfg.beta1 * getattr(state.m, name) + (1 - cfg.beta1) * g
            v = cfg.beta2 * getattr(state.v, name) + (1 - cfg.beta2) * g * g
            lr = lrs[name]
            if cfg.pp_optimizer:
                # PerPointAdam formulation (per_point_adam.py:75-98):
                # denom = sqrt(v) + eps; step = lr * sqrt(bc2)/bc1.
                # Whole-tensor zero-grad skip (per_point_adam.py:65-73).
                nonzero = jnp.sum(g * g) > 0
                m = jnp.where(nonzero, m, getattr(state.m, name))
                v = jnp.where(nonzero, v, getattr(state.v, name))
                denom = jnp.sqrt(v) + cfg.eps
                step_size = lr * jnp.sqrt(bc2) / bc1
                upd = step_size * m / denom
                if name == "xyz" and state.per_point_lr is not None:
                    upd = upd * state.per_point_lr
                    # NOTE: the reference's self-adjusting per-point LR
                    # (per_point_adam.py:26-32, applied at :98) updates a
                    # LOCAL variable that is never written back to the
                    # param group — the adjustment is discarded every
                    # step. Persisting it compounds ~1.01x/step and
                    # destabilizes long runs (verified on TPU), so we
                    # match the reference's effective behavior: the
                    # confidence-derived LRs stay fixed.
                p = p - upd
            else:
                # torch.optim.Adam formulation: denom = sqrt(v)/sqrt(bc2)+eps.
                denom = jnp.sqrt(v) / jnp.sqrt(bc2) + cfg.eps
                p = p - lr / bc1 * m / denom
            new_p[name], new_m[name], new_v[name] = p, m, v

        params = params.replace(**new_p)
        return params, AdamState(
            m=state.m.replace(**new_m),
            v=state.v.replace(**new_v),
            step=t,
            per_point_lr=new_ppl,
        )
