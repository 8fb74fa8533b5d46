"""Data-parallel DUSt3R/MASt3R pre-training over a TPU device mesh.

TPU-native replacement for the reference's torch-DDP training path
(dust3r/training.py:92-236 + DistributedDataParallel at 152-155 and the
per-rank DistributedSampler, SURVEY.md §3.5): instead of NCCL allreduce
on gradients, the batch dimension is sharded over a 1-D
`jax.sharding.Mesh` and parameters are replicated — XLA inserts the
gradient all-reduce over ICI automatically from the shardings. The whole
(forward, loss, backward, AdamW update) is one jitted program.

Optimizer: AdamW + cosine LR with linear warmup, matching the croco
training recipe the reference uses (adjust_learning_rate; blr/min_lr/
warmup_epochs in dust3r/training.py args).

The reference's 10 dataset loaders stream rendered multi-view data that is
not available in this environment; `synthetic_batch` provides a
geometry-consistent stand-in for tests, and `train_loop` takes any
iterator of (view1, view2) batches.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from instantsplat_tpu.models import mast3r
from instantsplat_tpu.train_dust3r.losses import regr3d_conf_loss


def cosine_warmup_schedule(base_lr, min_lr, warmup_steps, total_steps):
    def lr(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * step / jnp.maximum(warmup_steps, 1)
        t = (step - warmup_steps) / jnp.maximum(
            total_steps - warmup_steps, 1)
        cos = min_lr + (base_lr - min_lr) * 0.5 * (
            1 + jnp.cos(jnp.pi * jnp.clip(t, 0.0, 1.0)))
        return jnp.where(step < warmup_steps, warm, cos)

    return lr


def make_dp_train_step(
    cfg: mast3r.MASt3RConfig,
    mesh=None,
    base_lr=1e-4,
    min_lr=1e-6,
    warmup_steps=100,
    total_steps=10_000,
    weight_decay=0.05,
    beta1=0.9,
    beta2=0.95,
    loss_fn: Optional[Callable] = None,
    alpha=0.2,
):
    """-> (init_state, train_step).

    train_step(state, batch) -> (state, metrics); batch = dict with
    img1/img2 [B,H,W,3], gt1/gt2 view dicts (see losses.regr3d_conf_loss).
    With a mesh, the batch's leading axis is sharded and params replicated.
    """
    lr_sched = cosine_warmup_schedule(
        base_lr, min_lr, warmup_steps, total_steps)
    loss_fn = loss_fn or regr3d_conf_loss
    eps = 1e-8

    def init_state(params):
        return dict(
            params=params,
            m=jax.tree.map(jnp.zeros_like, params),
            v=jax.tree.map(jnp.zeros_like, params),
            step=jnp.zeros((), jnp.int32),
        )

    def objective(params, batch):
        r1, r2 = mast3r.forward_pair(
            params, cfg, batch["img1"], batch["img2"])
        r2 = dict(r2)
        r2["pts3d_in_other_view"] = r2.pop("pts3d")
        loss, details = loss_fn(
            batch["gt1"], batch["gt2"], r1, r2, alpha=alpha)
        return loss, details

    @jax.jit
    def train_step(state, batch):
        (loss, details), grads = jax.value_and_grad(
            objective, has_aux=True)(state["params"], batch)
        step = state["step"] + 1
        lr = lr_sched(step)
        t = step.astype(jnp.float32)
        bc1 = 1 - beta1**t
        bc2 = 1 - beta2**t

        def upd(p, g, m, v):
            m = beta1 * m + (1 - beta1) * g
            v = beta2 * v + (1 - beta2) * g * g
            u = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
            # decoupled weight decay on matrix weights only (AdamW)
            wd = weight_decay if p.ndim >= 2 else 0.0
            return p - lr * (u + wd * p), m, v

        out = jax.tree.map(upd, state["params"], grads, state["m"],
                           state["v"])
        new_p = jax.tree.map(lambda o: o[0], out,
                             is_leaf=lambda x: isinstance(x, tuple))
        new_m = jax.tree.map(lambda o: o[1], out,
                             is_leaf=lambda x: isinstance(x, tuple))
        new_v = jax.tree.map(lambda o: o[2], out,
                             is_leaf=lambda x: isinstance(x, tuple))
        new_state = dict(params=new_p, m=new_m, v=new_v, step=step)
        return new_state, dict(loss=loss, lr=lr, **details)

    def shard_batch(batch):
        if mesh is None:
            return batch
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = list(mesh.axis_names)[0]
        sh = NamedSharding(mesh, P(axis))

        def put(x):
            return jax.device_put(x, sh) if hasattr(x, "shape") and \
                x.ndim >= 1 else x

        return jax.tree.map(put, batch)

    return init_state, train_step, shard_batch


def train_loop(params, cfg, batches: Iterator, mesh=None, n_steps=None,
               log_every=10, **kw):
    """Simple driver: returns (params, history)."""
    init_state, train_step, shard_batch = make_dp_train_step(
        cfg, mesh=mesh, **kw)
    state = init_state(params)
    history = []
    for i, batch in enumerate(batches):
        if n_steps is not None and i >= n_steps:
            break
        state, metrics = train_step(state, shard_batch(batch))
        if i % log_every == 0 or (n_steps and i == n_steps - 1):
            history.append((i, {k: float(v) for k, v in metrics.items()}))
    return state["params"], history


def synthetic_batch(cfg, batch=2, h=32, w=48, seed=0):
    """Geometry-consistent random pre-training batch (tests/smoke)."""
    rng = np.random.default_rng(seed)
    pts_w = rng.standard_normal((batch, h, w, 3)).astype(np.float32)
    pts_w[..., 2] += 4.0
    pose1 = np.tile(np.eye(4, dtype=np.float32), (batch, 1, 1))
    pose2 = pose1.copy()
    pose2[:, 0, 3] = 0.3
    return dict(
        img1=rng.random((batch, h, w, 3)).astype(np.float32),
        img2=rng.random((batch, h, w, 3)).astype(np.float32),
        gt1=dict(pts3d=jnp.asarray(pts_w), camera_pose=jnp.asarray(pose1),
                 valid_mask=jnp.ones((batch, h, w), bool)),
        gt2=dict(pts3d=jnp.asarray(pts_w + 0.1),
                 camera_pose=jnp.asarray(pose2),
                 valid_mask=jnp.ones((batch, h, w), bool)),
    )
