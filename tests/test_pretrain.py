"""DUSt3R pre-training stack: loss semantics + DP training step on the
virtual 8-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from instantsplat_tpu.models import mast3r
from instantsplat_tpu.train_dust3r import losses, trainer
from tests.test_mast3r import TINY


def test_regr3d_zero_when_prediction_matches_gt():
    """Perfect prediction (GT transformed into cam-1 frame, normalized the
    same way) -> Regr3D term 0; ConfLoss reduces to alpha-regularizer."""
    batch = trainer.synthetic_batch(TINY, batch=2)
    in_cam1 = losses.se3_inv(batch["gt1"]["camera_pose"])
    b = batch["gt1"]["pts3d"].shape[0]

    def to_cam1(p):
        from instantsplat_tpu.init.geometry import geotrf

        return geotrf(in_cam1, p.reshape(b, -1, 3)).reshape(p.shape)

    pred1 = dict(pts3d=to_cam1(batch["gt1"]["pts3d"]),
                 conf=jnp.full(batch["gt1"]["pts3d"].shape[:-1], 2.0))
    pred2 = dict(pts3d_in_other_view=to_cam1(batch["gt2"]["pts3d"]),
                 conf=jnp.full(batch["gt2"]["pts3d"].shape[:-1], 2.0))
    loss, details = losses.regr3d_conf_loss(
        batch["gt1"], batch["gt2"], pred1, pred2, alpha=0.2)
    assert float(details["regr3d_1"]) < 1e-6
    assert float(details["regr3d_2"]) < 1e-6
    # pure confidence regularizer: 2 * (0 * 2 - 0.2 * log 2)
    expect = 2 * (-0.2 * np.log(2.0))
    assert abs(float(loss) - expect) < 1e-5


def test_conf_weighting_direction():
    """Higher confidence on a WRONG pixel must increase the loss."""
    batch = trainer.synthetic_batch(TINY, batch=1)
    shape = batch["gt1"]["pts3d"].shape[:-1]
    bad1 = dict(pts3d=batch["gt1"]["pts3d"] + 1.0,
                conf=jnp.full(shape, 1.5))
    bad1_hi = dict(pts3d=bad1["pts3d"], conf=jnp.full(shape, 5.0))
    pred2 = dict(pts3d_in_other_view=batch["gt2"]["pts3d"],
                 conf=jnp.full(shape, 1.5))
    lo, _ = losses.regr3d_conf_loss(batch["gt1"], batch["gt2"], bad1, pred2)
    hi, _ = losses.regr3d_conf_loss(
        batch["gt1"], batch["gt2"], bad1_hi, pred2)
    assert float(hi) > float(lo)


@pytest.mark.slow
def test_dp_train_step_runs_and_learns():
    """One mesh-sharded AdamW step sequence decreases the loss."""
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    params = mast3r.init_params(TINY, seed=0)
    batch = trainer.synthetic_batch(TINY, batch=8, h=32, w=32)
    params2, history = trainer.train_loop(
        params, TINY, iter([batch] * 8), mesh=mesh, n_steps=8,
        base_lr=5e-4, warmup_steps=2, total_steps=8, log_every=1)
    losses_seen = [m["loss"] for _, m in history]
    assert np.isfinite(losses_seen).all()
    assert losses_seen[-1] < losses_seen[0]
    # params actually moved
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     params, params2)
    assert max(jax.tree.leaves(d)) > 0
