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


def test_bf16_mixed_precision_step():
    """AMP-equivalent path (VERDICT r1 item 8): bf16 compute, fp32 master
    params + Adam state, no loss scaler needed (bf16 keeps fp32's exponent
    range). Loss finite, params move, and master dtypes stay fp32."""
    from instantsplat_tpu.train_dust3r import trainer

    params = mast3r.init_params(TINY, seed=0)
    batch = trainer.synthetic_batch(TINY, batch=2)
    init_state, step, shard = trainer.make_dp_train_step(
        TINY, base_lr=5e-4, warmup_steps=1, total_steps=4,
        compute_dtype=jnp.bfloat16)
    state = init_state(params)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    for leaf in jax.tree.leaves(state["params"]):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32
    moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         params, state["params"])
    assert max(jax.tree.leaves(moved)) > 0


def test_grad_accumulation_matches_single_step():
    """accum_iter=2 over the SAME micro-batch twice == one plain step on
    that batch (averaging identical gradients is the identity), exactly
    reproducing the reference's loss/accum_iter + deferred update
    semantics (dust3r/training.py:307-311)."""
    from instantsplat_tpu.train_dust3r import trainer

    params = mast3r.init_params(TINY, seed=0)
    mb = trainer.synthetic_batch(TINY, batch=2)
    kw = dict(base_lr=5e-4, warmup_steps=1, total_steps=4)

    init1, step1, _ = trainer.make_dp_train_step(TINY, **kw)
    s1, m1 = step1(init1(params), mb)

    init2, step2, _ = trainer.make_dp_train_step(TINY, accum_iter=2, **kw)
    stacked = trainer.stack_microbatches([mb, mb])
    s2, m2 = step2(init2(params), stacked)

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                        s1["params"], s2["params"])
    # fp32 reassociation (g/2 + g/2 vs g) through Adam's rsqrt: ~1e-5 ULP
    assert max(jax.tree.leaves(diff)) < 1e-4


def test_auto_resume_reproduces_trajectory(tmp_path):
    """Kill/restart mid-loop == uninterrupted run (VERDICT r1 item 8;
    reference auto-resume: training.py:101-103 checkpoint-last)."""
    from instantsplat_tpu.train_dust3r import trainer

    params = mast3r.init_params(TINY, seed=0)
    batches = [trainer.synthetic_batch(TINY, batch=2, seed=s)
               for s in range(6)]
    kw = dict(base_lr=5e-4, warmup_steps=2, total_steps=6, log_every=1)

    p_full, _ = trainer.train_loop(
        params, TINY, iter(batches), n_steps=6, **kw)

    out = str(tmp_path / "run")
    trainer.train_loop(params, TINY, iter(batches), n_steps=4,
                       output_dir=out, **kw)  # "killed" after 4 steps
    import os
    assert os.path.isfile(os.path.join(out, "checkpoint-last.npz"))
    p_res, _ = trainer.train_loop(params, TINY, iter(batches), n_steps=6,
                                  output_dir=out, **kw)

    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                        p_full, p_res)
    assert max(jax.tree.leaves(diff)) < 1e-6


def test_nonfinite_loss_aborts():
    """Reference sys.exit(1)s on a non-finite loss (training.py:303-305);
    the loop must raise, not train on."""
    from instantsplat_tpu.train_dust3r import trainer

    params = mast3r.init_params(TINY, seed=0)
    batch = trainer.synthetic_batch(TINY, batch=2)
    batch["gt1"]["pts3d"] = batch["gt1"]["pts3d"].at[0, 0, 0, 0].set(
        jnp.nan)
    with pytest.raises(FloatingPointError):
        trainer.train_loop(params, TINY, iter([batch] * 2), n_steps=2,
                           log_every=1, base_lr=5e-4, warmup_steps=1,
                           total_steps=2)


def test_crop_resize_view_geometry_consistency():
    """The shared loader transform (base_stereo_view_dataset.py:137-183):
    output resolution is exact, intrinsics scale with the resample, and
    unprojecting the cropped depth with the updated K reproduces the same
    camera-frame surface as the original view."""
    from instantsplat_tpu.train_dust3r.datasets import crop_resize_view

    h, w, f = 64, 96, 80.0
    # principal point off-center (but > 1/5 margins) exercises the pre-crop
    K = np.array([[f, 0, 52.0], [0, f, 30.0], [0, 0, 1]], np.float32)
    gx, gy = np.meshgrid(np.arange(w), np.arange(h))
    # true camera-frame plane n.p = d: depth = d / (n . ray)
    n_pl = np.array([0.15, 0.25, 1.0])
    n_pl /= np.linalg.norm(n_pl)
    d_pl = 3.0
    ray = np.stack([(gx - K[0, 2]) / f, (gy - K[1, 2]) / f,
                    np.ones_like(gx)], -1)
    depth = (d_pl / (ray @ n_pl)).astype(np.float32)
    img = np.random.default_rng(0).random((h, w, 3)).astype(np.float32)

    res = (48, 32)
    img2, depth2, K2 = crop_resize_view(img, depth, K, res)
    assert depth2.shape == (res[1], res[0])
    assert img2.shape == (res[1], res[0], 3)
    # scale factor should reflect the resample (within crop rounding)
    assert 0.3 < K2[0, 0] / f < 0.7
    # camera-frame points of the ORIGINAL view lie on one plane; the
    # transformed view's unprojection must lie on the SAME plane
    # (nearest-resampled depth => small quantization tolerance)
    ggx, ggy = np.meshgrid(np.arange(res[0]), np.arange(res[1]))
    x = (ggx - K2[0, 2]) / K2[0, 0] * depth2
    y = (ggy - K2[1, 2]) / K2[1, 1] * depth2
    pts2 = np.stack([x, y, depth2], -1).reshape(-1, 3)
    xo = (gx - K[0, 2]) / f * depth
    yo = (gy - K[1, 2]) / f * depth
    pts1 = np.stack([xo, yo, depth], -1).reshape(-1, 3)

    def plane(pts):
        c = pts.mean(0)
        _, _, vt = np.linalg.svd(pts - c, full_matrices=False)
        n = vt[2]
        return n / np.linalg.norm(n) * np.sign(n[2]), c

    n1, c1 = plane(pts1)
    n2, _ = plane(pts2)
    np.testing.assert_allclose(n2, n1, atol=0.02)
    resid = np.abs((pts2 - c1) @ n1)
    assert resid.max() < 0.1, resid.max()


def test_crop_resize_view_portrait_and_aug(tmp_path):
    from instantsplat_tpu.train_dust3r.datasets import (
        PosedMultiViewDataset,
        crop_resize_view,
        write_synthetic_scene,
    )

    # portrait input flips the target orientation deterministically
    h, w, f = 96, 64, 80.0
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    depth = np.full((h, w), 2.0, np.float32)
    img = np.zeros((h, w, 3), np.float32)
    img2, depth2, _ = crop_resize_view(img, depth, K, (48, 32))
    assert depth2.shape == (48, 32)  # (W,H) target transposed

    # aug_crop with an rng perturbs the rescale target but output size is
    # still exact
    rng = np.random.default_rng(0)
    img3, depth3, _ = crop_resize_view(img, depth, K, (48, 32), rng=rng,
                                       aug_crop=8)
    assert depth3.shape == (48, 32)

    # dataset-level: resolution-enabled batches are uniformly shaped and
    # geometrically valid
    write_synthetic_scene(tmp_path, "s0", n_views=4, h=40, w=56)
    ds = PosedMultiViewDataset(tmp_path, pair_window=1,
                               resolution=(32, 24), aug_crop=4)
    b = next(iter(ds.batches(batch_size=2, seed=0)))
    assert b["img1"].shape == (2, 24, 32, 3)
    assert b["gt1"]["pts3d"].shape == (2, 24, 32, 3)
    assert bool(np.isfinite(np.asarray(b["gt1"]["pts3d"])).all())
    # pts3d must still lie on the synthetic scene's z=4 world plane
    z = np.asarray(b["gt1"]["pts3d"])[..., 2]
    np.testing.assert_allclose(z, 4.0, atol=1e-2)


def test_multi_resolution_pool(tmp_path):
    """A list of resolutions behaves like the reference's
    BatchedRandomSampler pool: each batch draws one (W, H), shared by all
    its views (batched_sampler.py:11-18)."""
    from instantsplat_tpu.train_dust3r.datasets import (
        PosedMultiViewDataset,
        write_synthetic_scene,
    )

    write_synthetic_scene(tmp_path, "s0", n_views=6, h=40, w=56)
    ds = PosedMultiViewDataset(
        tmp_path, pair_window=2, resolution=[(32, 24), (40, 16)])
    shapes = set()
    for b in ds.batches(batch_size=2, seed=0, n_epochs=3):
        s1 = tuple(np.asarray(b["img1"]).shape[1:3])
        s2 = tuple(np.asarray(b["img2"]).shape[1:3])
        assert s1 == s2  # within-batch constraint
        shapes.add(s1)
    assert shapes == {(24, 32), (16, 40)}, shapes  # pool is exercised


def test_regr3d_variants_invariances():
    """The loss-zoo variants (losses.py:241-296): shift_inv ignores a
    global depth offset, scale_inv ignores a global scale, dist_clip
    invalidates far GT points."""
    batch = trainer.synthetic_batch(TINY, batch=2)
    gt1, gt2 = batch["gt1"], batch["gt2"]
    shape = gt1["pts3d"].shape[:-1]
    conf = jnp.full(shape, 2.0)
    rng = np.random.default_rng(0)
    noise = jnp.asarray(rng.standard_normal(gt1["pts3d"].shape) * 0.05,
                        jnp.float32)

    from instantsplat_tpu.init.geometry import geotrf
    from instantsplat_tpu.train_dust3r.losses import se3_inv

    in_cam1 = se3_inv(gt1["camera_pose"])
    b = shape[0]

    def cam1(p):
        return geotrf(in_cam1, p.reshape(b, -1, 3)).reshape(p.shape)

    pred_pts1 = cam1(gt1["pts3d"]) + noise
    pred_pts2 = cam1(gt2["pts3d"]) + noise

    def loss_of(p1, p2, **kw):
        pr1 = dict(pts3d=p1, conf=conf)
        pr2 = dict(pts3d_in_other_view=p2, conf=conf)
        val, _ = losses.regr3d_conf_loss(gt1, gt2, pr1, pr2,
                                         normalize=False, **kw)
        return float(val)

    shift = 3.0
    base = loss_of(pred_pts1, pred_pts2, shift_inv=True)
    shifted = loss_of(pred_pts1.at[..., 2].add(shift),
                      pred_pts2.at[..., 2].add(shift), shift_inv=True)
    np.testing.assert_allclose(shifted, base, rtol=1e-4)
    # without the variant the shift hurts
    assert loss_of(pred_pts1.at[..., 2].add(shift), pred_pts2) \
        > loss_of(pred_pts1, pred_pts2)

    base_s = loss_of(pred_pts1, pred_pts2, scale_inv=True)
    scaled = loss_of(pred_pts1 * 3.0, pred_pts2 * 3.0, scale_inv=True)
    np.testing.assert_allclose(scaled, base_s, rtol=1e-4)

    # dist_clip: corrupting a far-away GT point does not change the loss
    # once that point is clipped out
    far = gt1["pts3d"].at[0, 0, 0].set(
        gt1["pts3d"][0, 0, 0] * 0 + 1e4)
    gt1_far = dict(gt1, pts3d=far)
    l_clip = losses.regr3d_conf_loss(
        gt1_far, gt2, dict(pts3d=pred_pts1, conf=conf),
        dict(pts3d_in_other_view=pred_pts2, conf=conf),
        normalize=False, dist_clip=100.0)[0]
    l_ref = losses.regr3d_conf_loss(
        gt1, gt2, dict(pts3d=pred_pts1, conf=conf),
        dict(pts3d_in_other_view=pred_pts2, conf=conf),
        normalize=False,
        dist_clip=100.0)[0]
    # the corrupted pixel is invalid in one and valid in the other; both
    # must be finite and differ only through that pixel's mask weight
    assert np.isfinite(float(l_clip)) and np.isfinite(float(l_ref))


def test_find_opt_scaling():
    from instantsplat_tpu.train_dust3r.losses import find_opt_scaling

    rng = np.random.default_rng(0)
    b, n = 2, 400
    gt = rng.standard_normal((b, n, 1, 3)).astype(np.float32) + 3.0
    s_true = np.array([0.5, 2.0], np.float32)
    pr = gt * s_true[:, None, None, None]
    for mode in ("avg", "median", "weiszfeld_stop_grad"):
        s = np.asarray(find_opt_scaling(gt, gt, pr, pr, fit_mode=mode))
        np.testing.assert_allclose(s, s_true, rtol=1e-3)

    # outliers: weiszfeld/median stay near truth, avg is dragged off
    pr_out = pr.copy()
    pr_out[:, :20] *= 50.0
    s_avg = np.asarray(find_opt_scaling(gt, gt, pr_out, pr_out,
                                        fit_mode="avg"))
    s_wei = np.asarray(find_opt_scaling(gt, gt, pr_out, pr_out,
                                        fit_mode="weiszfeld"))
    assert np.abs(s_wei - s_true).max() < 0.2
    assert np.abs(s_avg - s_true).max() > 1.0

    # valid masks exclude the outliers entirely
    vm = np.ones((b, n, 1), bool)
    vm[:, :20] = False
    s_m = np.asarray(find_opt_scaling(gt, gt, pr_out, pr_out,
                                      fit_mode="avg", valid1=vm,
                                      valid2=vm))
    np.testing.assert_allclose(s_m, s_true, rtol=1e-3)


def test_metric_scale_sky_and_log_variants():
    """MASt3R metric-training extensions (mast3r/losses.py:27-136):
    '?avg_dis' keeps metric elements unnormalized, sky pixels contribute
    a forced loss, log-norm compresses far-point errors."""
    batch = trainer.synthetic_batch(TINY, batch=2)
    gt1, gt2 = dict(batch["gt1"]), dict(batch["gt2"])
    shape = gt1["pts3d"].shape[:-1]
    conf = jnp.full(shape, 2.0)

    from instantsplat_tpu.init.geometry import geotrf
    from instantsplat_tpu.train_dust3r.losses import se3_inv

    in_cam1 = se3_inv(gt1["camera_pose"])
    b = shape[0]

    def cam1(p):
        return geotrf(in_cam1, p.reshape(b, -1, 3)).reshape(p.shape)

    # prediction at 2x the GT's metric scale
    pr1 = dict(pts3d=cam1(gt1["pts3d"]) * 2.0, conf=conf)
    pr2 = dict(pts3d_in_other_view=cam1(gt2["pts3d"]) * 2.0, conf=conf)

    # fully normalized: the 2x scale washes out => regr residual ~ 0
    l_norm, d_norm = losses.regr3d_conf_loss(gt1, gt2, pr1, pr2)
    assert float(d_norm["regr3d_1"]) < 1e-5

    # metric mode: is_metric_scale keeps the prediction's scale and
    # applies GT's factor => the 2x error is now visible
    gt1_m = dict(gt1, is_metric_scale=jnp.ones((b,), bool))
    _, d_met = losses.regr3d_conf_loss(gt1_m, gt2, pr1, pr2,
                                       norm_all=False)
    assert float(d_met["regr3d_1"]) > 0.1
    # max_metric_scale demotes over-extended scenes back to normalized
    _, d_dem = losses.regr3d_conf_loss(gt1_m, gt2, pr1, pr2,
                                       norm_all=False,
                                       max_metric_scale=1e-6)
    assert float(d_dem["regr3d_1"]) < 1e-5

    # sky pixels: flag some invalid pixels as sky => forced contribution
    vm = np.asarray(gt1["valid_mask"]).copy()
    vm[:, :2] = False
    sky = np.zeros_like(vm)
    sky[:, :2] = True
    gt1_s = dict(gt1, valid_mask=jnp.asarray(vm),
                 sky_mask=jnp.asarray(sky))
    perfect1 = dict(pts3d=cam1(gt1["pts3d"]), conf=conf)
    perfect2 = dict(pts3d_in_other_view=cam1(gt2["pts3d"]), conf=conf)
    l_nosky, _ = losses.regr3d_conf_loss(gt1_s, gt2, perfect1, perfect2)
    l_sky, _ = losses.regr3d_conf_loss(gt1_s, gt2, perfect1, perfect2,
                                       sky_loss_value=2.0)
    assert float(l_sky) > float(l_nosky)

    # loss_in_log compresses a far-point error
    far_gt = dict(gt1, pts3d=gt1["pts3d"] * 100.0)
    far_pr1 = dict(pts3d=cam1(far_gt["pts3d"]) + 5.0, conf=conf)
    _, d_lin = losses.regr3d_conf_loss(far_gt, gt2, far_pr1, perfect2,
                                       normalize=False)
    _, d_log = losses.regr3d_conf_loss(far_gt, gt2, far_pr1, perfect2,
                                       normalize=False, loss_in_log=True)
    assert float(d_log["regr3d_1"]) < float(d_lin["regr3d_1"])


def test_ap_matching_score():
    """APLoss semantics (mast3r/losses.py:275-347): perfect diagonal
    separation -> AP 1; each query with k higher-ranked negatives -> AP
    1/(1+k); '1-mean' reduction is the training loss."""
    from instantsplat_tpu.train_dust3r.losses import (
        ap_matching_score,
        get_similarities,
    )

    rng = np.random.default_rng(0)
    b, n, d = 2, 16, 8
    base = rng.standard_normal((b, n, d)).astype(np.float32)
    base /= np.linalg.norm(base, axis=-1, keepdims=True)
    assert float(ap_matching_score(base * 4, base * 4)) > 0.99

    # hand-built scores: query 0's positive is outranked by exactly one
    # negative => AP(q0) = 1/2, others perfect
    d1 = np.eye(4, dtype=np.float32)[None]  # [1,4,4] one-hot descriptors
    d2 = d1.copy()
    d2[0, 1] += 2.0 * d1[0, 0]  # negative j=1 scores 2.0 against query 0
    ap = float(ap_matching_score(d1, d2))
    np.testing.assert_allclose(ap, (0.5 + 1 + 1 + 1) / 4, atol=1e-6)

    # euclidean similarity mode is monotone-equivalent for ranking
    s_dot = np.asarray(get_similarities(base, base))
    s_euc = np.asarray(get_similarities(base, base, euc=True))
    assert s_euc.min() > 0 and s_euc.max() <= 1.0 + 1e-6
    assert float(ap_matching_score(base, base, euc=True)) == \
        float(ap_matching_score(base, base))

    # valid mask restricts the average
    vm = np.zeros((1, 4), bool)
    vm[0, 0] = True
    np.testing.assert_allclose(
        float(ap_matching_score(d1, d2, valid_matches=vm)), 0.5,
        atol=1e-6)


def test_matching_loss_over_correspondences():
    """MatchingLoss gathers descriptors at GT correspondence pixels
    (mast3r/losses.py:348-460); ConfMatchingLoss weights matches by
    desc-confidence with an alpha*log regularizer (losses.py:463-508)."""
    from instantsplat_tpu.train_dust3r.losses import matching_loss

    rng = np.random.default_rng(0)
    b, h, w, d, n = 2, 8, 12, 16, 10
    # descriptor field shared by both views at corresponding pixels
    field = rng.standard_normal((b, h, w, d)).astype(np.float32)
    field /= np.linalg.norm(field, axis=-1, keepdims=True)
    xy = np.stack([rng.integers(0, w, (b, n)),
                   rng.integers(0, h, (b, n))], -1)
    gt1 = dict(corres=xy, valid_corres=np.ones((b, n), bool))
    gt2 = dict(corres=xy)
    pred_good = dict(desc=field * 4,
                     desc_conf=np.full((b, h, w), 2.0, np.float32))
    shuf = field[:, :, ::-1] * 4  # misaligned descriptors
    pred_bad = dict(desc=shuf,
                    desc_conf=np.full((b, h, w), 2.0, np.float32))

    l_good, _ = matching_loss(gt1, gt2, pred_good, pred_good,
                              temperature=0.07)
    l_bad, _ = matching_loss(gt1, gt2, pred_bad, pred_good,
                             temperature=0.07)
    assert float(l_good) < float(l_bad)

    # withconf: higher confidence on bad matches raises the loss,
    # on good matches the alpha*log term rewards confidence
    hi = dict(pred_bad, desc_conf=np.full((b, h, w), 8.0, np.float32))
    lb, _ = matching_loss(gt1, gt2, pred_bad, pred_good, withconf=True)
    lbh, _ = matching_loss(gt1, gt2, hi, pred_good, withconf=True)
    assert float(lbh) > float(lb)

    # neg quantile: invalid matches' confs get supervised; loss finite
    gt1_nv = dict(gt1, valid_corres=np.concatenate(
        [np.ones((b, n // 2), bool), np.zeros((b, n - n // 2), bool)], 1))
    lq, det = matching_loss(gt1_nv, gt2, pred_good, pred_good,
                            withconf=True, neg_conf_loss_quantile=0.5)
    assert np.isfinite(float(lq))
    assert "matching_conf_loss" in det

    # use_pts3d: matching on pointmaps with euclidean similarity
    pts = rng.standard_normal((b, h, w, 3)).astype(np.float32)
    p1 = dict(pts3d=pts, conf=np.full((b, h, w), 2.0, np.float32))
    p2 = dict(pts3d_in_other_view=pts,
              conf=np.full((b, h, w), 2.0, np.float32))
    l3, _ = matching_loss(gt1, gt2, p1, p2, use_pts3d=True)
    assert np.isfinite(float(l3))


def test_gt_correspondence_extraction(tmp_path):
    """GT corres (mast3r/datasets/utils/cropping.py:22-118): reciprocal
    projective round-trips across a synthetic scene; matched pixels must
    refer to the SAME world point, negatives must be flagged invalid, and
    the dataset emits the static-shape fields matching_loss consumes."""
    from instantsplat_tpu.train_dust3r.datasets import (
        PosedMultiViewDataset,
        extract_correspondences_from_pts3d,
        write_synthetic_scene,
    )

    write_synthetic_scene(tmp_path, "s0", n_views=3, h=32, w=48)
    ds = PosedMultiViewDataset(tmp_path, pair_window=1, n_corres=64,
                               nneg=0.25)
    b = next(iter(ds.batches(batch_size=2, seed=0)))
    xy1 = np.asarray(b["gt1"]["corres"])
    xy2 = np.asarray(b["gt2"]["corres"])
    cv = np.asarray(b["gt1"]["valid_corres"])
    assert xy1.shape == (2, 64, 2) and cv.shape == (2, 64)
    assert cv.any() and (~cv).any()  # nneg produced real negatives
    p1 = np.asarray(b["gt1"]["pts3d"])
    p2 = np.asarray(b["gt2"]["pts3d"])
    for k in range(2):
        a = p1[k][xy1[k, cv[k], 1], xy1[k, cv[k], 0]]
        c = p2[k][xy2[k, cv[k], 1], xy2[k, cv[k], 0]]
        # same world point up to pixel quantization of the z=4 plane
        assert np.abs(a - c).max() < 0.2, np.abs(a - c).max()

    # raw extraction without target keeps all reciprocal matches
    sc = ds.scenes[0]
    va = ds._load_view(sc, 0)
    vb = ds._load_view(sc, 1)
    v = dict(pts3d=va["pts3d"], K=va["K"], camera_pose=va["camera_pose"])
    w = dict(pts3d=vb["pts3d"], K=vb["K"], camera_pose=vb["camera_pose"])
    m1, m2 = extract_correspondences_from_pts3d(v, w)
    assert len(m1) > 100
    a = va["pts3d"][m1[:, 1], m1[:, 0]]
    c = vb["pts3d"][m2[:, 1], m2[:, 0]]
    assert np.abs(a - c).max() < 0.2

    # matching loss consumes the batch directly
    from instantsplat_tpu.train_dust3r.losses import matching_loss

    h_, w_ = p1.shape[1:3]
    rng = np.random.default_rng(0)
    desc = rng.standard_normal((2, h_, w_, 8)).astype(np.float32)
    pred = dict(desc=desc, desc_conf=np.full((2, h_, w_), 2.0, np.float32))
    val, _ = matching_loss(b["gt1"], b["gt2"], pred, pred, withconf=True)
    assert np.isfinite(float(val))


def test_correspondence_extraction_zero_overlap():
    """Disjoint frusta (zero reciprocal matches): every emitted slot must
    be valid=False — fabricated positives would actively pull unrelated
    descriptors together (the reference refuses such pairs via assert,
    cropping.py:48; the generic directory dataset instead fills the quota
    with real negatives)."""
    from instantsplat_tpu.train_dust3r.datasets import (
        extract_correspondences_from_pts3d,
    )

    h, w = 16, 24
    gx, gy = np.meshgrid(np.arange(w, dtype=np.float64),
                         np.arange(h, dtype=np.float64))
    K = np.array([[20.0, 0, w / 2], [0, 20.0, h / 2], [0, 0, 1]])
    z = 4.0
    pts_a = np.stack([(gx - K[0, 2]) / K[0, 0] * z,
                      (gy - K[1, 2]) / K[1, 1] * z,
                      np.full_like(gx, z)], -1)
    pts_b = pts_a + np.array([1000.0, 0.0, 0.0])  # far-disjoint scene
    va = dict(pts3d=pts_a, K=K, camera_pose=np.eye(4))
    pose_b = np.eye(4)
    pose_b[0, 3] = 1000.0
    vb = dict(pts3d=pts_b, K=K, camera_pose=pose_b)
    xy1, xy2, valid = extract_correspondences_from_pts3d(
        va, vb, target_n_corres=32, rng=np.random.default_rng(0))
    assert xy1.shape == (32, 2) and valid.shape == (32,)
    assert not valid.any()


def test_infonce_negatives_are_distractors():
    """valid=False rows stay in the softmax denominators (reference
    losses.py:272 masks only the positive selection): replacing a
    negative's descriptor must change the loss of the valid rows."""
    from instantsplat_tpu.train_dust3r.losses import infonce_matching_loss

    rng = np.random.default_rng(3)
    b, n, d = 1, 16, 8
    d1 = rng.standard_normal((b, n, d)).astype(np.float32)
    d2 = rng.standard_normal((b, n, d)).astype(np.float32)
    valid = np.ones((b, n), bool)
    valid[:, -4:] = False
    base = float(infonce_matching_loss(d1, d2, valid_matches=valid))
    # make a negative row nearly identical to a valid row's positive
    # -> a strong distractor in that row's denominator -> loss rises
    d2_hard = d2.copy()
    d2_hard[:, -1] = d2[:, 0] + 1e-3
    hard = float(infonce_matching_loss(d1, d2_hard, valid_matches=valid))
    assert hard > base + 1e-4


def test_mast3r_finetune_step_with_matching(tmp_path):
    """End-to-end MASt3R fine-tuning objective: Regr3D conf loss +
    conf-weighted descriptor matching over dataset-produced GT corres,
    through one DP training step."""
    from instantsplat_tpu.train_dust3r.datasets import (
        PosedMultiViewDataset,
        write_synthetic_scene,
    )
    from instantsplat_tpu.train_dust3r.losses import mast3r_finetune_loss

    write_synthetic_scene(tmp_path, "s0", n_views=3, h=32, w=48)
    ds = PosedMultiViewDataset(tmp_path, pair_window=1, n_corres=32)
    batches = list(ds.batches(batch_size=2, seed=0, n_epochs=2))
    params = mast3r.init_params(TINY, seed=0)
    p2, history = trainer.train_loop(
        params, TINY, iter(batches), n_steps=2, log_every=1,
        base_lr=5e-4, warmup_steps=1, total_steps=2,
        loss_fn=mast3r_finetune_loss)
    ls = [m["loss"] for _, m in history]
    assert np.isfinite(ls).all()
    assert "matching_conf_loss" in history[0][1]


def test_color_jitter(tmp_path):
    from instantsplat_tpu.train_dust3r.datasets import (
        PosedMultiViewDataset,
        color_jitter,
        write_synthetic_scene,
    )

    rng = np.random.default_rng(0)
    img = rng.random((16, 20, 3)).astype(np.float32)
    out = color_jitter(img, np.random.default_rng(1))
    assert out.shape == img.shape and out.dtype == np.float32
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert np.abs(out - img).max() > 0.01  # actually changed
    # deterministic under the same rng state
    out2 = color_jitter(img, np.random.default_rng(1))
    np.testing.assert_allclose(out, out2)

    # dataset applies it to images only; geometry untouched
    write_synthetic_scene(tmp_path, "s0", n_views=3, h=24, w=32)
    plain = PosedMultiViewDataset(tmp_path, pair_window=1)
    jit = PosedMultiViewDataset(tmp_path, pair_window=1,
                                transform="color_jitter")
    b0 = next(iter(plain.batches(2, seed=0)))
    b1 = next(iter(jit.batches(2, seed=0)))
    assert np.abs(np.asarray(b0["img1"]) - np.asarray(b1["img1"])).max() > 0.01
    np.testing.assert_allclose(np.asarray(b0["gt1"]["pts3d"]),
                               np.asarray(b1["gt1"]["pts3d"]))
