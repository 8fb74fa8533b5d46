"""DUSt3R pre-training losses in JAX: Regr3D + ConfLoss.

Clean-room equivalents of dust3r/losses.py (the path used by the
reference's pre-training stack, SURVEY.md §2.4 / §3.5):

- `Regr3D` (losses.py:142-195): express both views' GT pointmaps in view
  1's camera frame, jointly normalize prediction and GT pointclouds by the
  masked mean distance-to-origin ('avg_dis',
  dust3r/utils/geometry.py:249-290), and penalize the per-pixel L2-1
  distance (L21Loss, losses.py:54-60: norm over the channel dim);
- `ConfLoss` (losses.py:197-238): weight the pixel loss by the predicted
  confidence minus alpha * log(conf) — the self-calibrated aleatoric
  weighting that trains the confidence head.

All masking is static-shape (where-masks + masked means) so the loss jits
cleanly; boolean gather in the reference becomes multiplication by the
valid mask here (identical value: both sides reduce with masked means).
"""

from __future__ import annotations

import jax.numpy as jnp

from instantsplat_tpu.init.geometry import geotrf


def _masked_mean(x, mask, axis=None, eps=1e-8):
    num = jnp.sum(jnp.where(mask, x, 0.0), axis=axis)
    den = jnp.sum(mask.astype(x.dtype), axis=axis)
    return num / jnp.maximum(den, eps)


def normalize_pointcloud(pts1, pts2, valid1, valid2):
    """Joint 'avg_dis' normalization (geometry.py:249-290): divide both
    pointmaps by the masked mean distance-to-origin over BOTH views.

    pts: [B,H,W,3]; valid: [B,H,W]. Returns (pts1, pts2, factor [B,1,1,1]).
    """
    d1 = jnp.linalg.norm(pts1, axis=-1)
    d2 = jnp.linalg.norm(pts2, axis=-1)
    all_d = jnp.concatenate([d1.reshape(d1.shape[0], -1),
                             d2.reshape(d2.shape[0], -1)], axis=1)
    all_m = jnp.concatenate([valid1.reshape(d1.shape[0], -1),
                             valid2.reshape(d2.shape[0], -1)], axis=1)
    factor = _masked_mean(all_d, all_m, axis=1)
    factor = jnp.maximum(factor, 1e-8)[:, None, None, None]
    return pts1 / factor, pts2 / factor, factor


def get_joint_pointcloud_depth(z1, z2, valid1, valid2, quantile=0.5):
    """Joint masked depth quantile over both views -> [B]
    (dust3r/utils/geometry.py:313-324)."""
    b = z1.shape[0]
    nan1 = jnp.where(valid1, z1, jnp.nan).reshape(b, -1)
    nan2 = jnp.where(valid2, z2, jnp.nan).reshape(b, -1)
    return jnp.nanquantile(jnp.concatenate([nan1, nan2], -1),
                           quantile, axis=-1)


def get_joint_pointcloud_center_scale(pts1, pts2, valid1, valid2,
                                      z_only=False, center=True):
    """Joint masked median center [B,1,3] + median-norm scale [B,1,1,1]
    (dust3r/utils/geometry.py:327-342; no_grad in the reference =>
    stop_gradient here)."""
    b = pts1.shape[0]
    nan1 = jnp.where(valid1[..., None], pts1, jnp.nan).reshape(b, -1, 3)
    nan2 = jnp.where(valid2[..., None], pts2, jnp.nan).reshape(b, -1, 3)
    pts = jnp.concatenate([nan1, nan2], axis=1)
    c = jnp.nanmedian(pts, axis=1, keepdims=True)  # [B,1,3]
    if z_only:
        c = c.at[..., :2].set(0.0)
    n = jnp.linalg.norm((pts - c) if center else pts, axis=-1)
    scale = jnp.nanmedian(n, axis=1)
    import jax

    return (jax.lax.stop_gradient(c),
            jax.lax.stop_gradient(scale)[:, None, None, None])


def find_opt_scaling(gt_pts1, gt_pts2, pr_pts1, pr_pts2,
                     fit_mode="weiszfeld_stop_grad",
                     valid1=None, valid2=None):
    """Per-batch scalar s minimizing |pr - s*gt| over valid pixels
    (dust3r/inference.py:106-150): 'avg' closed-form L2, 'median' of
    per-pixel ratios, 'weiszfeld' 10-step IRLS; '*_stop_grad' detaches.
    Returns [B], clipped to >= 1e-3."""
    b = gt_pts1.shape[0]

    def flat(p, v):
        p = p.reshape(b, -1, 3)
        m = (jnp.ones(p.shape[:2], bool) if v is None
             else v.reshape(b, -1))
        return p, m

    g1, m1 = flat(gt_pts1, valid1)
    g2, m2 = flat(gt_pts2, valid2)
    p1, _ = flat(pr_pts1, None)
    p2, _ = flat(pr_pts2, None)
    gt = jnp.concatenate([g1, g2], 1)
    pr = jnp.concatenate([p1, p2], 1)
    m = jnp.concatenate([m1, m2], 1)

    dot_gp = jnp.sum(pr * gt, -1)
    dot_gg = jnp.sum(gt * gt, -1)
    if fit_mode.startswith("avg"):
        s = _masked_mean(dot_gp, m, 1) / jnp.maximum(
            _masked_mean(dot_gg, m, 1), 1e-12)
    elif fit_mode.startswith("median"):
        r = jnp.where(m, dot_gp / jnp.maximum(dot_gg, 1e-12), jnp.nan)
        s = jnp.nanmedian(r, axis=1)
    elif fit_mode.startswith("weiszfeld"):
        s = _masked_mean(dot_gp, m, 1) / jnp.maximum(
            _masked_mean(dot_gg, m, 1), 1e-12)
        for _ in range(10):
            dis = jnp.linalg.norm(pr - s[:, None, None] * gt, axis=-1)
            w = 1.0 / jnp.maximum(dis, 1e-8)
            s = _masked_mean(w * dot_gp, m, 1) / jnp.maximum(
                _masked_mean(w * dot_gg, m, 1), 1e-12)
    else:
        raise ValueError(f"bad fit_mode {fit_mode}")
    if fit_mode.endswith("stop_grad"):
        import jax

        s = jax.lax.stop_gradient(s)
    return jnp.maximum(s, 1e-3)


def se3_inv(m):
    R = jnp.swapaxes(m[..., :3, :3], -1, -2)
    t = -jnp.einsum("...ij,...j->...i", R, m[..., :3, 3])
    out = jnp.zeros_like(m)
    out = out.at[..., :3, :3].set(R)
    out = out.at[..., :3, 3].set(t)
    return out.at[..., 3, 3].set(1.0)


def apply_log_to_norm(xyz):
    """Log-compress the radial norm (mast3r/losses.py:20-25)."""
    d = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    return xyz / jnp.maximum(d, 1e-8) * jnp.log1p(d)


def regr3d_conf_loss(gt1, gt2, pred1, pred2, alpha=0.2, norm_gt=True,
                     normalize=True, dist_clip=None,
                     shift_inv=False, scale_inv=False,
                     norm_all=True, max_metric_scale=0.0,
                     sky_loss_value=0.0, loss_in_log=False):
    """ConfLoss(Regr3D(L21, norm_mode='avg_dis'), alpha) — the training
    objective of dust3r pre-training (dust3r/training.py config default).

    gt_k: dict(pts3d [B,H,W,3] world frame, camera_pose [B,4,4] c2w,
    valid_mask [B,H,W]); pred_k: dict(pts3d / pts3d_in_other_view, conf).

    Variants of the reference loss zoo:
    - normalize=False: norm_mode=None (no 'avg_dis' normalization);
      norm_gt=False with normalize=True is the reference's gt_scale=True
      (predictions normalized, GT kept metric);
    - dist_clip: GT points beyond this camera-1 distance become invalid
      (losses.py:159-173);
    - shift_inv: subtract the joint masked median depth from GT and
      prediction z separately (Regr3D_ShiftInv, losses.py:241-263);
    - scale_inv: divide GT and prediction by their own joint
      median-centered median norms (Regr3D_ScaleInv, losses.py:266-292;
      pred scale clipped to [1e-3, 1e3]); both -> Regr3D_ScaleShiftInv
      (shift first, then scale — the reference's MRO order).

    MASt3R metric-training extensions (mast3r/losses.py:27-136):
    - norm_all=False: the '?avg_dis' mode — batch elements with
      gt1['is_metric_scale'] keep the predicted metric scale (GT's
      normalization factor is applied to them); max_metric_scale demotes
      over-extended scenes back to normalized treatment;
    - sky_loss_value: gt['sky_mask'] pixels without valid 3D count as
      valid with this forced loss value;
    - loss_in_log: 'before' log-compresses GT before comparison (linear
      depth_mode), True log-compresses both at the criterion (exp mode).

    Returns (scalar loss, details dict).
    """
    in_cam1 = se3_inv(gt1["camera_pose"])
    b = gt1["pts3d"].shape[0]
    gt_pts1 = geotrf(in_cam1, gt1["pts3d"].reshape(b, -1, 3)).reshape(
        gt1["pts3d"].shape)
    gt_pts2 = geotrf(in_cam1, gt2["pts3d"].reshape(b, -1, 3)).reshape(
        gt2["pts3d"].shape)
    valid1 = gt1["valid_mask"]
    valid2 = gt2["valid_mask"]
    if dist_clip is not None:
        valid1 = valid1 & (jnp.linalg.norm(gt_pts1, axis=-1) <= dist_clip)
        valid2 = valid2 & (jnp.linalg.norm(gt_pts2, axis=-1) <= dist_clip)

    if loss_in_log == "before":
        # linear depth_mode variant (mast3r/losses.py:60-63)
        gt_pts1 = apply_log_to_norm(gt_pts1)
        gt_pts2 = apply_log_to_norm(gt_pts2)

    pr_pts1 = pred1["pts3d"]
    pr_pts2 = pred2.get("pts3d_in_other_view", pred2.get("pts3d"))

    # metric-scale handling ('?avg_dis', mast3r/losses.py:31-97): batch
    # elements flagged is_metric_scale keep their predicted scale (the GT
    # normalization factor is applied to them instead), unless their GT
    # extent exceeds max_metric_scale.
    metric = None
    if not norm_all:
        metric = gt1.get("is_metric_scale")
        if metric is None:
            metric = jnp.zeros((b,), bool)
        if max_metric_scale:
            d1 = jnp.where(valid1, jnp.linalg.norm(gt_pts1, axis=-1),
                           0.0).reshape(b, -1).max(1)
            d2 = jnp.where(valid2, jnp.linalg.norm(gt_pts2, axis=-1),
                           0.0).reshape(b, -1).max(1)
            metric = metric & (d1 < max_metric_scale) \
                & (d2 < max_metric_scale)

    if normalize:
        pr_n1, pr_n2, _ = normalize_pointcloud(
            pr_pts1, pr_pts2, valid1, valid2)
        if metric is None:
            pr_pts1, pr_pts2 = pr_n1, pr_n2
        else:
            sel = metric[:, None, None, None]
            pr_pts1 = jnp.where(sel, pr_pts1, pr_n1)
            pr_pts2 = jnp.where(sel, pr_pts2, pr_n2)
        if norm_gt:
            gt_pts1, gt_pts2, gt_factor = normalize_pointcloud(
                gt_pts1, gt_pts2, valid1, valid2)
            if metric is not None:
                sel = metric[:, None, None, None]
                pr_pts1 = jnp.where(sel, pr_pts1 / gt_factor, pr_pts1)
                pr_pts2 = jnp.where(sel, pr_pts2 / gt_factor, pr_pts2)

    if shift_inv:
        gt_shift = get_joint_pointcloud_depth(
            gt_pts1[..., 2], gt_pts2[..., 2], valid1, valid2)
        pr_shift = get_joint_pointcloud_depth(
            pr_pts1[..., 2], pr_pts2[..., 2], valid1, valid2)
        gt_pts1 = gt_pts1.at[..., 2].add(-gt_shift[:, None, None])
        gt_pts2 = gt_pts2.at[..., 2].add(-gt_shift[:, None, None])
        pr_pts1 = pr_pts1.at[..., 2].add(-pr_shift[:, None, None])
        pr_pts2 = pr_pts2.at[..., 2].add(-pr_shift[:, None, None])
    if scale_inv:
        _, gt_scale = get_joint_pointcloud_center_scale(
            gt_pts1, gt_pts2, valid1, valid2)
        _, pr_scale = get_joint_pointcloud_center_scale(
            pr_pts1, pr_pts2, valid1, valid2)
        pr_scale = jnp.clip(pr_scale, 1e-3, 1e3)
        if norm_gt:
            gt_pts1 = gt_pts1 / jnp.maximum(gt_scale, 1e-12)
            gt_pts2 = gt_pts2 / jnp.maximum(gt_scale, 1e-12)
            pr_pts1 = pr_pts1 / pr_scale
            pr_pts2 = pr_pts2 / pr_scale
        else:  # gt_scale=True: force prediction onto the GT scale
            pr_pts1 = pr_pts1 * gt_scale / pr_scale
            pr_pts2 = pr_pts2 * gt_scale / pr_scale

    # L21: norm over channels, per pixel
    if loss_in_log and loss_in_log != "before":
        # exp depth_mode variant (mast3r/losses.py:120-132)
        pr_pts1, gt_pts1 = apply_log_to_norm(pr_pts1), apply_log_to_norm(gt_pts1)
        pr_pts2, gt_pts2 = apply_log_to_norm(pr_pts2), apply_log_to_norm(gt_pts2)
    l1 = jnp.linalg.norm(pr_pts1 - gt_pts1, axis=-1)
    l2 = jnp.linalg.norm(pr_pts2 - gt_pts2, axis=-1)

    if sky_loss_value > 0:
        # sky pixels (labelled sky, no valid 3D) count as valid with a
        # forced high loss (mast3r/losses.py:100-136)
        sky1 = gt1.get("sky_mask")
        sky2 = gt2.get("sky_mask")
        if sky1 is not None:
            sky1 = sky1 & ~valid1
            l1 = jnp.where(sky1, sky_loss_value, l1)
            valid1 = valid1 | sky1
        if sky2 is not None:
            sky2 = sky2 & ~valid2
            l2 = jnp.where(sky2, sky_loss_value, l2)
            valid2 = valid2 | sky2

    conf1 = pred1["conf"]
    conf2 = pred2["conf"]
    cl1 = l1 * conf1 - alpha * jnp.log(conf1)
    cl2 = l2 * conf2 - alpha * jnp.log(conf2)
    loss = _masked_mean(cl1, valid1) + _masked_mean(cl2, valid2)
    details = dict(
        regr3d_1=_masked_mean(l1, valid1),
        regr3d_2=_masked_mean(l2, valid2),
        conf_loss_1=_masked_mean(cl1, valid1),
        conf_loss_2=_masked_mean(cl2, valid2),
    )
    return loss, details


# ---------------------------------------------------------------------------
# MASt3R descriptor matching loss (fine-tuning objective)
# ---------------------------------------------------------------------------


def get_similarities(desc1, desc2, euc=False):
    """[B,N,D] x [B,M,D] -> [B,N,M] similarity (mast3r/losses.py:202-209):
    dot product, or 1/(1+euclidean) mapped into the same range."""
    if euc:
        d = jnp.linalg.norm(desc1[:, :, None] - desc2[:, None], axis=-1)
        return 1.0 / (1.0 + d)
    return jnp.einsum("bnd,bmd->bnm", desc1, desc2)


def ap_matching_score(desc1, desc2, valid_matches=None, euc=False):
    """True average precision of diagonal positives
    (mast3r/losses.py:275-347 APLoss with nq='torch'): with exactly one
    positive per query (the diagonal), AP reduces to 1 / (1 + #negatives
    ranked above it). Non-differentiable (the reference computes it under
    no_grad and trains through the similarity scores only via 1-mean
    reduction of these detached APs — here we return the mean AP; use
    1 - ap as the loss term exactly like the reference's '1-mean').
    """
    d1 = jnp.asarray(desc1, jnp.float32)
    d2 = jnp.asarray(desc2, jnp.float32)
    scores = get_similarities(d1, d2, euc)  # [B, N, N]
    pos = jnp.diagonal(scores, axis1=-2, axis2=-1)  # [B, N]
    posrank = jnp.sum(scores > pos[:, :, None], axis=-1)  # strict: ties
    # resolve in the positive's favor, matching descending stable sort
    ap = 1.0 / (1.0 + posrank.astype(jnp.float32))
    if valid_matches is not None:
        v = jnp.asarray(valid_matches, bool)
        return jnp.sum(jnp.where(v, ap, 0.0)) / jnp.maximum(
            jnp.sum(v), 1)
    return jnp.mean(ap)


def infonce_matching_loss(desc1, desc2, valid_matches=None,
                          temperature=0.07, eps=1e-8, mode="proper",
                          euc=False, reduction="mean"):
    """InfoNCE over matched descriptor pairs (mast3r/losses.py:237-273).

    desc1/desc2: [B, N, D] descriptors of CORRESPONDING points (positives
    along the diagonal of the per-batch similarity matrix); valid_matches:
    [B, N] bool. Modes: 'all' (single normalization over the whole matrix),
    'proper' (row + column normalizations), 'dual' (same as proper in this
    implementation's contract). euc switches the similarity to
    1/(1+euclidean) (get_similarities).
    """
    import jax.numpy as jnp

    d1 = jnp.asarray(desc1, jnp.float32)
    d2 = jnp.asarray(desc2, jnp.float32)
    b, n, _ = d1.shape
    if valid_matches is None:
        valid = jnp.ones((b, n), bool)
    else:
        valid = jnp.asarray(valid_matches, bool)

    import jax

    sim = get_similarities(d1, d2, euc) / temperature
    # NaN similarities are ignored (reference losses.py:256); invalid rows
    # stay IN the normalizations — deliberate negatives (valid=False) act
    # as distractors in every denominator, only the positive-pair term is
    # masked out of the sum (reference losses.py:272 `loss[valid_matches]`).
    sim = jnp.where(jnp.isnan(sim), -jnp.inf, sim)
    log_pos = jnp.diagonal(sim, axis1=-2, axis2=-1)  # [B, N]
    # log-sum-exp form: the reference exponentiates in place (losses.py:259)
    # which overflows at low temperature; this is the stable equivalent.
    if mode == "all":
        denom = jax.nn.logsumexp(sim, axis=(-1, -2))[:, None]
        loss = -(log_pos - denom)
    else:  # 'proper' / 'dual'
        loss = -(
            (log_pos - jax.nn.logsumexp(sim, axis=-2))
            + (log_pos - jax.nn.logsumexp(sim, axis=-1))
        )
    loss = jnp.where(valid, loss, 0.0)
    if reduction == "none":
        return loss  # [B, N] per-match (0 where invalid)
    return jnp.sum(loss) / jnp.maximum(jnp.sum(valid), 1)


def matching_loss(gt1, gt2, pred1, pred2, withconf=False, use_pts3d=False,
                  temperature=0.07, mode="proper", alpha=1.0,
                  confmode="prod", neg_conf_loss_quantile=0.0):
    """Per-image descriptor matching loss over GT correspondences
    (mast3r/losses.py:348-460 MatchingLoss; withconf=True adds the
    ConfMatchingLoss weighting, losses.py:463-508).

    gt_k['corres']: [B, N, 2] int (x, y) pixel coords of matched points;
    gt1['valid_corres']: [B, N] bool. pred_k carries dense 'desc' +
    'desc_conf' maps ([B, H, W, D] / [B, H, W]); use_pts3d matches on
    pointmaps with euclidean similarity instead (losses.py:384-388).
    The reference's blocksize shuffling is a memory cap for N > 4096 —
    here the [B, N, N] similarity stays static-shape; subsample
    correspondences upstream to bound N. negatives_padding is likewise a
    CUDA-memory workaround, not replicated.

    Returns (scalar loss, details dict).
    """
    desc1 = pred1["pts3d"] if use_pts3d else pred1["desc"]
    desc2 = (pred2.get("pts3d_in_other_view", pred2.get("pts3d"))
             if use_pts3d else pred2["desc"])
    euc = bool(use_pts3d)
    xy1 = jnp.asarray(gt1["corres"], jnp.int32)
    xy2 = jnp.asarray(gt2["corres"], jnp.int32)
    valid = jnp.asarray(gt1["valid_corres"], bool)
    b = desc1.shape[0]
    bi = jnp.arange(b)[:, None]
    d1 = desc1[bi, xy1[..., 1], xy1[..., 0]]
    d2 = desc2[bi, xy2[..., 1], xy2[..., 0]]
    per = infonce_matching_loss(d1, d2, valid_matches=valid,
                                temperature=temperature, mode=mode,
                                euc=euc, reduction="none")
    n_valid = jnp.maximum(jnp.sum(valid), 1)
    details = dict(matching_loss=jnp.sum(per) / n_valid)
    if not withconf:
        return details["matching_loss"], details

    conf_key = "conf" if use_pts3d else "desc_conf"
    c1 = pred1[conf_key][bi, xy1[..., 1], xy1[..., 0]]
    c2 = pred2[conf_key][bi, xy2[..., 1], xy2[..., 0]]
    if confmode == "prod":
        conf = c1 * c2
    elif confmode == "mean":
        conf = 0.5 * (c1 + c2)
    else:
        raise ValueError(f"unknown confmode {confmode}")
    conf = jnp.maximum(conf, 1e-8)
    cl = per * conf - alpha * jnp.log(conf)
    loss = jnp.sum(jnp.where(valid, cl, 0.0)) / n_valid
    if neg_conf_loss_quantile:
        # unmatched points' confidences chase the positive-loss quantile
        # (losses.py:498-507)
        import jax

        neg_val = jax.lax.stop_gradient(jnp.nanquantile(
            jnp.where(valid, per, jnp.nan), neg_conf_loss_quantile))
        ncl = neg_val * conf - alpha * jnp.log(conf)
        n_neg = jnp.maximum(jnp.sum(~valid), 1)
        loss = loss + jnp.sum(jnp.where(valid, 0.0, ncl)) / n_neg
    details["matching_conf_loss"] = loss
    return loss, details


def mast3r_finetune_loss(gt1, gt2, pred1, pred2, alpha=0.2,
                         match_weight=1.0, match_temperature=0.07,
                         match_alpha=1.0, **regr_kw):
    """Combined MASt3R fine-tuning objective: the confidence-weighted
    Regr3D term plus the confidence-weighted descriptor matching term
    (the reference trains MASt3R with ConfLoss(Regr3D...) +
    ConfMatchingLoss(MatchingLoss(InfoNCE)) — mast3r/losses.py:348-508).
    The matching term engages when the batch carries GT correspondences
    (gt1['corres'] / gt1['valid_corres'] / gt2['corres'], produced by
    datasets.PosedMultiViewDataset(n_corres=...)). `alpha` weights the
    Regr3D ConfLoss log-conf regularizer; `match_alpha` the matching
    term's (ConfMatchingLoss defaults alpha=1.0, mast3r/losses.py:469 —
    the two are independent knobs in the reference recipe)."""
    loss, details = regr3d_conf_loss(gt1, gt2, pred1, pred2, alpha=alpha,
                                     **regr_kw)
    if "corres" in gt1:
        ml, md = matching_loss(gt1, gt2, pred1, pred2, withconf=True,
                               alpha=match_alpha,
                               temperature=match_temperature)
        loss = loss + match_weight * ml
        details.update(md)
    return loss, details
