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


def test_infonce_matching_loss():
    """Matching descriptors beat shuffled ones; perfect one-hot-like
    separation drives the loss toward zero."""
    import numpy as np
    import jax.numpy as jnp

    from instantsplat_tpu.train_dust3r.losses import infonce_matching_loss

    rng = np.random.default_rng(0)
    b, n, d = 2, 32, 16
    base = rng.standard_normal((b, n, d)).astype(np.float32)
    base /= np.linalg.norm(base, axis=-1, keepdims=True)
    matched = infonce_matching_loss(base, base)
    shuffled = infonce_matching_loss(
        base, base[:, rng.permutation(n)])
    assert float(matched) < float(shuffled)
    # sharp descriptors (scaled similarity) -> near-zero proper-InfoNCE
    sharp = infonce_matching_loss(base * 4.0, base * 4.0,
                                  temperature=0.01)
    assert float(sharp) < 0.1
    # valid mask excludes rows
    vm = np.ones((b, n), bool)
    vm[:, : n // 2] = False
    masked = infonce_matching_loss(base, base, valid_matches=vm)
    assert np.isfinite(float(masked))


def test_colmap_db_export(tmp_path):
    import sqlite3

    import numpy as np

    from instantsplat_tpu.data.colmap_db import export_matches_to_colmap_db

    edges = [(0, 1), (1, 0)]
    xy1 = np.array([[4, 5], [10, 12]])
    xy2 = np.array([[6, 7], [11, 13]])
    ids = export_matches_to_colmap_db(
        tmp_path / "db.db", ["a.png", "b.png"], (48, 64),
        [100.0, 100.0], [(xy1, xy2), (xy2, xy1)], edges,
        w2c_priors=np.tile(np.eye(4), (2, 1, 1)),
    )
    con = sqlite3.connect(tmp_path / "db.db")
    assert con.execute("SELECT COUNT(*) FROM images").fetchone()[0] == 2
    assert con.execute("SELECT COUNT(*) FROM cameras").fetchone()[0] == 2
    n_kp = con.execute(
        "SELECT rows FROM keypoints WHERE image_id=?",
        (ids[0],)).fetchone()[0]
    assert n_kp == 2
    rows, data = con.execute(
        "SELECT rows, data FROM matches").fetchone()
    assert rows == 2
    m = np.frombuffer(data, np.uint32).reshape(-1, 2)
    assert m.shape == (2, 2)
    con.close()


def test_posed_dataset_batches(tmp_path):
    import numpy as np

    from instantsplat_tpu.train_dust3r.datasets import (
        PosedMultiViewDataset,
        write_synthetic_scene,
    )

    write_synthetic_scene(tmp_path, "s0", n_views=5)
    write_synthetic_scene(tmp_path, "s1", n_views=4, seed=1)
    ds = PosedMultiViewDataset(tmp_path, pair_window=2)
    assert len(ds) > 0
    batches = list(ds.batches(batch_size=2, seed=0))
    assert len(batches) >= 2
    b = batches[0]
    assert b["img1"].shape == (2, 32, 48, 3)
    assert b["gt1"]["pts3d"].shape == (2, 32, 48, 3)
    assert b["gt2"]["camera_pose"].shape == (2, 4, 4)
    assert bool(b["gt1"]["valid_mask"].all())
    # unprojection consistency: depth=z along optical axis recovers depth
    pts = np.asarray(b["gt1"]["pts3d"][0])
    pose = np.asarray(b["gt1"]["camera_pose"][0])
    cam_pts = (pts.reshape(-1, 3) - pose[:3, 3]) @ pose[:3, :3]
    assert np.isfinite(cam_pts).all() and (cam_pts[:, 2] > 0).all()
    # sharding splits pairs disjointly
    b0 = list(ds.batches(2, shard=(0, 2)))
    b1 = list(ds.batches(2, shard=(1, 2)))
    assert len(b0) + len(b1) <= len(batches) + 1
