"""Posed multi-view datasets for DUSt3R/MASt3R pre-training.

The reference's 10 dataset loaders (dust3r/datasets/, mast3r/datasets/)
stream rendered multi-view crops with GT pointmaps from Co3D, ScanNet++,
BlendedMVS, ... None of those archives exist in this environment, so this
module provides the pipeline-facing equivalent: a generic posed-RGBD
directory dataset that yields exactly the (view1, view2) batch dicts
`train_dust3r.losses.regr3d_conf_loss` consumes, plus the pair-sampling
and epoch plumbing of dust3r/datasets/__init__.py (shuffled pairs,
per-epoch reseeding; sharding across hosts replaces DistributedSampler).

Directory layout per scene:
    <scene>/images/<name>.png        RGB
    <scene>/depth/<name>.npy         [H, W] float32 depth (0 = invalid)
    <scene>/poses.npz                c2w [V, 4, 4], K [V, 3, 3],
                                     names [V] (matching file stems)
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


# -- geometry-aware crop/resize core --------------------------------------
# The piece every reference loader shares (dust3r/datasets/base/
# base_stereo_view_dataset.py:137-183 `_crop_resize_if_necessary` +
# datasets/utils/cropping.py): joint image/depth/intrinsics rescale and
# crop, principal-point-centered pre-crop, portrait/square orientation
# selection, and `aug_crop` target enlargement. Intrinsics scaling happens
# in the COLMAP pixel-center convention (+0.5) and converts back
# (dust3r/utils/geometry.py:223-246).


def camera_matrix_of_crop(K, input_resolution, output_resolution,
                          scaling=1.0, offset_factor=0.5, offset=None):
    """Intrinsics after scaling then cropping to output_resolution
    (cropping.py:90-104). Resolutions are (W, H)."""
    margins = (np.asarray(input_resolution, np.float64) * scaling
               - np.asarray(output_resolution, np.float64))
    assert np.all(margins >= -1e-6), margins
    if offset is None:
        offset = offset_factor * margins
    K2 = np.asarray(K, np.float64).copy()
    K2[0, 2] += 0.5
    K2[1, 2] += 0.5
    K2[:2, :] *= scaling
    K2[:2, 2] -= offset
    K2[0, 2] -= 0.5
    K2[1, 2] -= 0.5
    return K2.astype(np.float32)


def rescale_view(img, depth, K, output_resolution, force=True):
    """Jointly rescale (img [H,W,3] float 0..1, depth [H,W], K) so the
    output covers `output_resolution` (W, H): Lanczos down / bicubic up
    for the image, nearest for depth (cropping.py:57-84)."""
    import PIL.Image

    in_res = np.array([img.shape[1], img.shape[0]])
    out = np.asarray(output_resolution, np.float64)
    scale = float(np.max(out / in_res)) + 1e-8
    if scale >= 1 and not force:
        return img, depth, np.asarray(K, np.float32)
    out_res = np.floor(in_res * scale).astype(int)
    u8 = img.dtype == np.uint8
    pim = PIL.Image.fromarray(
        img if u8 else (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8))
    resample = (PIL.Image.Resampling.LANCZOS if scale < 1
                else PIL.Image.Resampling.BICUBIC)
    pim = pim.resize(tuple(out_res), resample=resample)
    dep = PIL.Image.fromarray(np.asarray(depth, np.float32), mode="F")
    dep = dep.resize(tuple(out_res), resample=PIL.Image.Resampling.NEAREST)
    img2 = np.asarray(pim)
    if not u8:
        img2 = img2.astype(np.float32) / 255.0
    K2 = camera_matrix_of_crop(K, in_res, out_res, scaling=scale)
    return img2, np.asarray(dep), K2


def crop_view(img, depth, K, bbox):
    """Crop (l, t, r, b); principal point shifts by the crop origin
    (cropping.py:107-121)."""
    l, t, r, b = (int(v) for v in bbox)
    K2 = np.asarray(K, np.float32).copy()
    K2[0, 2] -= l
    K2[1, 2] -= t
    return img[t:b, l:r], depth[t:b, l:r], K2


def crop_resize_view(img, depth, K, resolution, rng=None, aug_crop=0):
    """Full reference view transform -> (img, depth, K) at `resolution`
    (W, H), W >= H (base_stereo_view_dataset.py:137-183):

    1. center a maximal crop on the principal point (asserts the pp is
       not within 1/5 of a border);
    2. transpose the target resolution for portrait inputs (H > 1.1 W),
       or randomly for near-square inputs;
    3. optionally enlarge the rescale target by rng.integers(0, aug_crop)
       (the reference's aug_crop augmentation), then rescale;
    4. final offset crop to exactly `resolution`.
    """
    h, w = np.asarray(depth).shape
    K = np.asarray(K, np.float64)
    cx, cy = int(round(K[0, 2])), int(round(K[1, 2]))
    mx, my = min(cx, w - cx), min(cy, h - cy)
    assert mx > w / 5 and my > h / 5, f"bad principal point ({cx},{cy})"
    img, depth, K = crop_view(img, depth, K,
                              (cx - mx, cy - my, cx + mx, cy + my))
    h, w = depth.shape
    resolution = tuple(int(v) for v in resolution)
    assert resolution[0] >= resolution[1]
    if h > 1.1 * w:
        resolution = resolution[::-1]
    elif 0.9 < h / w < 1.1 and resolution[0] != resolution[1]:
        if rng is not None and rng.integers(2):
            resolution = resolution[::-1]
    target = np.array(resolution)
    if aug_crop > 1 and rng is not None:
        target = target + int(rng.integers(0, aug_crop))
    img, depth, K = rescale_view(img, depth, K, target)
    K2 = camera_matrix_of_crop(
        K, (depth.shape[1], depth.shape[0]), resolution, offset_factor=0.5)
    l = int(round(K[0, 2] - K2[0, 2]))
    t = int(round(K[1, 2] - K2[1, 2]))
    return crop_view(img, depth, K,
                     (l, t, l + resolution[0], t + resolution[1]))


# -- color augmentation -----------------------------------------------------
# The reference's training transform is ColorJitter(0.5, 0.5, 0.5, 0.1) +
# ImgNorm (dust3r/datasets/utils/transforms.py:11); ImgNorm (x*2-1) is
# applied inside the model here (models/mast3r.py), so the dataset only
# jitters. torchvision semantics, numpy implementation.


def color_jitter(img, rng, brightness=0.5, contrast=0.5, saturation=0.5,
                 hue=0.1):
    """Randomized brightness/contrast/saturation/hue jitter of an
    [H,W,3] float image in [0,1], ops applied in random order like
    torchvision.transforms.ColorJitter."""
    from matplotlib.colors import hsv_to_rgb, rgb_to_hsv

    img = np.asarray(img, np.float32)

    def do_brightness(x):
        return x * rng.uniform(max(0, 1 - brightness), 1 + brightness)

    def do_contrast(x):
        f = rng.uniform(max(0, 1 - contrast), 1 + contrast)
        gray = float((x @ np.array([0.299, 0.587, 0.114])).mean())
        return gray + (x - gray) * f

    def do_saturation(x):
        f = rng.uniform(max(0, 1 - saturation), 1 + saturation)
        gray = (x @ np.array([0.299, 0.587, 0.114]))[..., None]
        return gray + (x - gray) * f

    def do_hue(x):
        d = rng.uniform(-hue, hue)
        hsv = rgb_to_hsv(np.clip(x, 0.0, 1.0))
        hsv[..., 0] = (hsv[..., 0] + d) % 1.0
        return hsv_to_rgb(hsv)

    ops = [do_brightness, do_contrast, do_saturation, do_hue]
    for i in rng.permutation(len(ops)):
        img = ops[i](img)
    return np.clip(img, 0.0, 1.0).astype(np.float32)


# -- GT correspondence extraction ------------------------------------------
# (mast3r/datasets/utils/cropping.py:22-118): project each view's world
# points into the other's image, quantize to pixels, keep reciprocal
# round-trips as positive matches; optionally subsample to a fixed count
# and pad with non-reciprocal negatives (valid=False) — the static-shape
# 'corres'/'valid_corres' batch fields losses.matching_loss consumes.


def _reproject_flat(pts_world, K, c2w, shape):
    """World points -> clipped flat pixel indices in the target view."""
    h, w = shape
    w2c = np.linalg.inv(np.asarray(c2w, np.float64))
    cam = pts_world.reshape(-1, 3) @ w2c[:3, :3].T + w2c[:3, 3]
    with np.errstate(divide="ignore", invalid="ignore"):
        uv = cam[:, :2] / cam[:, 2:3]
    px = uv[:, 0] * K[0, 0] + K[0, 2]
    py = uv[:, 1] * K[1, 1] + K[1, 2]
    with np.errstate(invalid="ignore"):
        qx = np.round(np.nan_to_num(px, nan=-1.0)).astype(np.int64)
        qy = np.round(np.nan_to_num(py, nan=-1.0)).astype(np.int64)
    inside = (qx >= 0) & (qx < w) & (qy >= 0) & (qy < h) & (cam[:, 2] > 0)
    flat = np.clip(qx, 0, w - 1) + w * np.clip(qy, 0, h - 1)
    # out-of-view pixels land on a clipped border pixel exactly like the
    # reference's ravel_xy clamp; reciprocity filters them out
    return flat, inside


def extract_correspondences_from_pts3d(view1, view2, target_n_corres=None,
                                       rng=None, nneg=0.0):
    """view_k: dict(pts3d [H,W,3] world-frame, camera_pose c2w [4,4],
    K [3,3]). -> (xy1 [N,2], xy2 [N,2]) int pixel coords, or with
    target_n_corres set -> (xy1 [T,2], xy2 [T,2], valid [T] bool) with
    `nneg` fraction of deliberate non-matches (valid=False)."""
    h1, w1 = view1["pts3d"].shape[:2]
    h2, w2 = view2["pts3d"].shape[:2]
    c12, in12 = _reproject_flat(view1["pts3d"], view2["K"],
                                view2["camera_pose"], (h2, w2))
    c21, in21 = _reproject_flat(view2["pts3d"], view1["K"],
                                view1["camera_pose"], (h1, w1))
    recip1 = (c21[c12] == np.arange(len(c12))) & in12
    pos1 = np.flatnonzero(recip1)
    pos2 = c12[pos1]
    recip2 = (c12[c21] == np.arange(len(c21))) & in21

    def unravel(pos, w):
        return np.stack([pos % w, pos // w], -1).astype(np.int32)

    if target_n_corres is None:
        return unravel(pos1, w1), unravel(pos2, w2)

    rng = rng or np.random.default_rng()
    # Reference slot accounting (cropping.py:39-54): positives capped by
    # availability, the shortfall filled with real negatives (valid=False
    # non-reciprocal pixels) — never fabricated positives. The reference
    # asserts when even negatives can't fill the quota; here (generic
    # directory data, zero-overlap pairs possible) the residual — only
    # reachable on near-fully-reciprocal degenerate views — pads with
    # valid=False zero rows that the masked matching losses ignore.
    avail_neg = int(min((~recip1).sum(), (~recip2).sum()))
    n_pos = min(len(pos1), int(target_n_corres * (1 - nneg)))
    n_neg = min(target_n_corres - n_pos, avail_neg)
    n_pos = min(target_n_corres - n_neg, len(pos1))
    n_pad = target_n_corres - n_pos - n_neg
    if n_pos < len(pos1):
        perm = rng.permutation(len(pos1))[:n_pos]
        pos1, pos2 = pos1[perm], pos2[perm]
    valid = np.ones(n_pos, bool)
    if n_neg > 0:
        def pick(mask):
            p = (~mask).astype(np.float64)
            return rng.choice(len(mask), size=n_neg, replace=False,
                              p=p / p.sum())

        pos1 = np.concatenate([pos1, pick(recip1)])
        pos2 = np.concatenate([pos2, pick(recip2)])
        valid = np.concatenate([valid, np.zeros(n_neg, bool)])
    if n_pad > 0:
        pos1 = np.concatenate([pos1, np.zeros(n_pad, int)])
        pos2 = np.concatenate([pos2, np.zeros(n_pad, int)])
        valid = np.concatenate([valid, np.zeros(n_pad, bool)])
    return unravel(pos1, w1), unravel(pos2, w2), valid


# -- shared pair-dataset base ------------------------------------------------
# The role of dust3r/datasets/base/{easy_dataset,base_stereo_view_dataset}.py:
# subclasses produce RAW per-view data (image, depth, K, c2w) and a pair
# index; this base applies the shared view transform (crop_resize_view +
# color jitter + unprojection + transpose-to-landscape), emits jnp-ready
# batches with optional GT-correspondence fields, and supports the
# reference's dataset arithmetic (`a + b` concat, `n @ a` resize with
# per-epoch resampling, `n * a` duplication — easy_dataset.py:11-21).


def finalize_view(img, depth, K, c2w, rng=None, resolution=None,
                  aug_crop=0, transform=None):
    """RAW view -> training view dict (the _get_views postlude every
    reference loader shares, base_stereo_view_dataset.py:185-226):
    crop/resize with intrinsics update, optional color jitter, pointmap
    unprojection, valid mask from depth>0, transpose-to-landscape."""
    img = np.asarray(img)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    depth = np.asarray(depth, np.float32)
    K = np.asarray(K, np.float32)
    c2w = np.asarray(c2w, np.float32)
    if resolution is not None:
        img, depth, K = crop_resize_view(img, depth, K, resolution,
                                         rng=rng, aug_crop=aug_crop)
    if transform == "color_jitter" and rng is not None:
        img = color_jitter(img, rng)
    h, w = depth.shape
    gx, gy = np.meshgrid(np.arange(w), np.arange(h))
    xy = np.stack([(gx - K[0, 2]) / K[0, 0],
                   (gy - K[1, 2]) / K[1, 1]], -1)
    pts_cam = np.concatenate([xy * depth[..., None], depth[..., None]], -1)
    pts_world = pts_cam.reshape(-1, 3) @ c2w[:3, :3].T + c2w[:3, 3]
    valid = (depth > 0) & np.isfinite(pts_world.reshape(h, w, 3)).all(-1)
    view = dict(
        img=img.astype(np.float32),
        pts3d=np.nan_to_num(pts_world.reshape(h, w, 3)).astype(np.float32),
        camera_pose=c2w,
        valid_mask=valid,
        true_shape=np.int32([h, w]),
        K=np.asarray(K, np.float32),
    )
    if h > w:
        # transpose_to_landscape (dust3r/datasets/base/
        # base_stereo_view_dataset.py:115-117 via utils/misc.py):
        # spatially transpose the arrays (values untouched) so every
        # view in a batch stacks in landscape layout; true_shape
        # records the real orientation for the ManyAR model path.
        for k in ("img", "pts3d", "valid_mask"):
            view[k] = np.swapaxes(view[k], 0, 1)
    return view


class PairViewDataset:
    """Base class for pair datasets. Subclasses set the transform knobs
    (resolutions/aug_crop/n_corres/nneg/transform) and implement
    `__len__` + `_get_views(idx, rng, resolution) -> (view1, view2)`
    (finalized view dicts, usually via `finalize_view`)."""

    resolutions = None
    aug_crop = 0
    n_corres = 0
    nneg = 0.0
    transform = None

    def _init_transform(self, resolution=None, aug_crop=0, n_corres=0,
                        nneg=0.0, transform=None):
        if resolution is not None and not isinstance(resolution, list):
            resolution = [tuple(resolution)]
        self.resolutions = resolution
        self.aug_crop = aug_crop
        self.n_corres = n_corres
        self.nneg = nneg
        assert transform in (None, "color_jitter"), transform
        self.transform = transform

    def __repr__(self):
        return f"{type(self).__name__}({len(self)} pairs)"

    # dataset arithmetic (easy_dataset.py:23-30)
    def __add__(self, other):
        return CatDataset([self, other])

    def __rmul__(self, factor):
        return MulDataset(factor, self)

    def __rmatmul__(self, factor):
        return ResizedDataset(factor, self)

    def set_epoch(self, epoch: int):
        pass

    def _get_views(self, idx, rng, resolution):
        raise NotImplementedError

    def _finalize(self, img, depth, K, c2w, rng, resolution):
        return finalize_view(img, depth, K, c2w, rng=rng,
                             resolution=resolution, aug_crop=self.aug_crop,
                             transform=self.transform)

    def batches(self, batch_size, seed=0, n_epochs=1, shard=None,
                num_workers: int = 0):
        """Yield jnp-ready batch dicts; `shard=(rank, world)` splits the
        pair list across hosts (the DistributedSampler role).

        num_workers > 1 fetches the batch's views with a thread pool (the
        torch DataLoader num_workers role, dust3r/training.py:74,253-264
        — the hot per-view work is image/EXR decode, which releases the
        GIL in the native codec). Each view gets its own child generator
        spawned from the batch rng, so results are deterministic per
        (seed, num_workers>1) but the augmentation stream differs from
        the sequential num_workers<=1 path."""
        import jax.numpy as jnp

        pool = None
        if num_workers and num_workers > 1:
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(max_workers=num_workers)
        try:
            yield from self._batches_impl(batch_size, seed, n_epochs,
                                          shard, pool, jnp)
        finally:
            if pool is not None:
                pool.shutdown(wait=False)

    def _batches_impl(self, batch_size, seed, n_epochs, shard, pool, jnp):
        for epoch in range(n_epochs):
            self.set_epoch(epoch)
            rng = np.random.default_rng(seed + epoch)
            order = rng.permutation(len(self))
            if shard is not None:
                rank, world = shard
                order = order[rank::world]
            for s in range(0, len(order) - batch_size + 1, batch_size):
                # one resolution per batch, shared by every view in it
                # (BatchedRandomSampler pool constraint,
                # base/batched_sampler.py:11-18)
                res = None
                if self.resolutions is not None:
                    res = self.resolutions[
                        int(rng.integers(len(self.resolutions)))]
                idxs = [int(k) for k in order[s:s + batch_size]]
                if pool is not None:
                    child = rng.spawn(len(idxs))
                    views = list(pool.map(
                        lambda kr: self._get_views(kr[0], kr[1], res),
                        zip(idxs, child)))
                else:
                    views = [self._get_views(k, rng, res) for k in idxs]
                v1s = [v[0] for v in views]
                v2s = [v[1] for v in views]

                def stack(vs):
                    return dict(
                        img=jnp.asarray(np.stack([v["img"] for v in vs])),
                        pts3d=jnp.asarray(
                            np.stack([v["pts3d"] for v in vs])),
                        camera_pose=jnp.asarray(
                            np.stack([v["camera_pose"] for v in vs])),
                        valid_mask=jnp.asarray(
                            np.stack([v["valid_mask"] for v in vs])),
                    )

                b1, b2 = stack(v1s), stack(v2s)
                out = dict(
                    img1=b1["img"], img2=b2["img"],
                    gt1=dict(pts3d=b1["pts3d"],
                             camera_pose=b1["camera_pose"],
                             valid_mask=b1["valid_mask"]),
                    gt2=dict(pts3d=b2["pts3d"],
                             camera_pose=b2["camera_pose"],
                             valid_mask=b2["valid_mask"]),
                )
                if self.n_corres:
                    c1s, c2s, cvs = [], [], []
                    for va, vb in zip(v1s, v2s):
                        xy1, xy2, cv = self._pair_corres(va, vb, rng)
                        c1s.append(xy1)
                        c2s.append(xy2)
                        cvs.append(cv)
                    out["gt1"]["corres"] = jnp.asarray(np.stack(c1s))
                    out["gt1"]["valid_corres"] = jnp.asarray(np.stack(cvs))
                    out["gt2"]["corres"] = jnp.asarray(np.stack(c2s))
                yield out

    def _pair_corres(self, v1, v2, rng):
        """Fixed-count GT correspondences for one view pair. Transposed
        (portrait) views are un-transposed for the projective round-trip
        and the resulting (x, y) swapped back into the stored layout."""
        def orient(v):
            t = bool(v["true_shape"][0] > v["true_shape"][1])
            pts = np.asarray(v["pts3d"])
            return dict(pts3d=np.swapaxes(pts, 0, 1) if t else pts,
                        K=v["K"], camera_pose=v["camera_pose"]), t

        o1, t1 = orient(v1)
        o2, t2 = orient(v2)
        xy1, xy2, cv = extract_correspondences_from_pts3d(
            o1, o2, target_n_corres=self.n_corres, rng=rng,
            nneg=self.nneg)
        if t1:
            xy1 = xy1[:, ::-1]
        if t2:
            xy2 = xy2[:, ::-1]
        return xy1, xy2, cv


class MulDataset(PairViewDataset):
    """`n * dataset`: each element duplicated n times
    (easy_dataset.py:42-62)."""

    def __init__(self, multiplicator, dataset):
        assert isinstance(multiplicator, int) and multiplicator > 0
        self.multiplicator = multiplicator
        self.dataset = dataset
        for k in ("resolutions", "aug_crop", "n_corres", "nneg",
                  "transform"):
            setattr(self, k, getattr(dataset, k))

    def __len__(self):
        return self.multiplicator * len(self.dataset)

    def __repr__(self):
        return f"{self.multiplicator}*{self.dataset!r}"

    def set_epoch(self, epoch):
        self.dataset.set_epoch(epoch)

    def _get_views(self, idx, rng, resolution):
        return self.dataset._get_views(idx // self.multiplicator, rng,
                                       resolution)


class ResizedDataset(PairViewDataset):
    """`n @ dataset`: fixed size n, randomly resampled (with duplicates
    if n > len) each epoch (easy_dataset.py:65-97)."""

    def __init__(self, size, dataset):
        assert isinstance(size, int) and size > 0
        self.size = size
        self.dataset = dataset
        for k in ("resolutions", "aug_crop", "n_corres", "nneg",
                  "transform"):
            setattr(self, k, getattr(dataset, k))
        self.set_epoch(0)

    def __len__(self):
        return self.size

    def __repr__(self):
        k = (len(str(self.size)) - 1) // 3
        suffix = ["", "K", "M", "G"][k]
        return f"{self.size // 1000 ** k}{suffix} @ {self.dataset!r}"

    def set_epoch(self, epoch):
        self.dataset.set_epoch(epoch)
        rng = np.random.default_rng(777 + epoch)
        n = len(self.dataset)
        reps = (self.size + n - 1) // n
        pool = np.concatenate(
            [rng.permutation(n) for _ in range(reps)])
        self._idxs = pool[: self.size]

    def _get_views(self, idx, rng, resolution):
        return self.dataset._get_views(int(self._idxs[idx]), rng,
                                       resolution)


class CatDataset(PairViewDataset):
    """`a + b`: dataset concatenation (easy_dataset.py:100-132). The
    children must share one transform configuration (resolution pool,
    n_corres, ...) so batches stay static-shape."""

    def __init__(self, datasets):
        flat = []
        for d in datasets:
            flat.extend(d.datasets if isinstance(d, CatDataset) else [d])
        self.datasets = flat
        for k in ("resolutions", "aug_crop", "n_corres", "nneg",
                  "transform"):
            vals = [getattr(d, k) for d in flat]
            assert all(v == vals[0] for v in vals), (
                f"concatenated datasets disagree on {k}: {vals}")
            setattr(self, k, vals[0])
        self._cum = np.cumsum([len(d) for d in flat])

    def __len__(self):
        return int(self._cum[-1])

    def __repr__(self):
        return " + ".join(repr(d) for d in self.datasets)

    def set_epoch(self, epoch):
        for d in self.datasets:
            d.set_epoch(epoch)

    def _get_views(self, idx, rng, resolution):
        di = int(np.searchsorted(self._cum, idx, side="right"))
        base = 0 if di == 0 else int(self._cum[di - 1])
        return self.datasets[di]._get_views(idx - base, rng, resolution)


class PosedMultiViewDataset(PairViewDataset):
    def __init__(self, root, scenes=None, pair_window=3, resolution=None,
                 aug_crop=0, n_corres=0, nneg=0.0, transform=None):
        """resolution: optional (W, H) target — or a LIST of (W, H)
        choices, one drawn per batch with all views in the batch sharing
        it (the BatchedRandomSampler aspect-ratio-pool constraint,
        dust3r/datasets/base/batched_sampler.py:11-18). Every view passes
        through `crop_resize_view` (the reference's shared loader
        transform) before unprojection, so intrinsics, depth, and pts3d
        stay consistent with the crop. aug_crop > 1 enables the random
        rescale-target enlargement augmentation. n_corres > 0 adds
        fixed-count GT correspondence fields (gt1['corres'],
        gt1['valid_corres'], gt2['corres']) to every batch — the
        matching-loss supervision (mast3r_base_stereo_view_dataset.py:
        104-137), with `nneg` fraction of deliberate negatives.
        transform='color_jitter' applies the reference's training color
        augmentation (transforms.py:11) to images only."""
        self._init_transform(resolution, aug_crop, n_corres, nneg,
                             transform)
        self.root = Path(root)
        self.scenes = []
        scene_dirs = ([self.root / s for s in scenes] if scenes
                      else sorted(p for p in self.root.iterdir()
                                  if p.is_dir()))
        for sdir in scene_dirs:
            meta = np.load(sdir / "poses.npz")
            names = [str(n) for n in meta["names"]]
            self.scenes.append(dict(
                dir=sdir, names=names,
                c2w=np.asarray(meta["c2w"], np.float32),
                K=np.asarray(meta["K"], np.float32),
            ))
        self.pair_window = pair_window
        self.pairs = []
        for si, sc in enumerate(self.scenes):
            v = len(sc["names"])
            for i in range(v):
                for d in range(1, pair_window + 1):
                    if i + d < v:
                        self.pairs.append((si, i, i + d))
                        self.pairs.append((si, i + d, i))

    def __len__(self):
        return len(self.pairs)

    def _load_view(self, scene, idx, rng=None, resolution=None):
        from instantsplat_tpu.data.images import load_image

        name = scene["names"][idx]
        img = load_image(scene["dir"] / "images" / f"{name}.png")
        depth = np.load(scene["dir"] / "depth" / f"{name}.npy")
        if resolution is None and self.resolutions is not None:
            resolution = self.resolutions[0]
        return self._finalize(img, depth, scene["K"][idx],
                              scene["c2w"][idx], rng, resolution)

    def _get_views(self, idx, rng, resolution):
        si, i, j = self.pairs[idx]
        scene = self.scenes[si]
        return (self._load_view(scene, i, rng, resolution=resolution),
                self._load_view(scene, j, rng, resolution=resolution))


def synthetic_views(n_views, h, w, focal, seed=0):
    """Geometrically consistent synthetic views (fronto-parallel plane at
    z=4 seen from shifted cameras) — the shared fixture geometry for every
    synthetic-scene writer. -> list of dicts(img u8 [H,W,3],
    depth f32 [H,W], K, c2w)."""
    rng = np.random.default_rng(seed)
    K = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]],
                 np.float32)
    gx, gy = np.meshgrid(np.arange(w), np.arange(h))
    out = []
    for v in range(n_views):
        ang = 0.08 * v
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 3] = [np.sin(ang), 0, -0.2 * v]
        dirs = np.stack([(gx - w / 2) / focal, (gy - h / 2) / focal,
                         np.ones_like(gx)], -1) @ c2w[:3, :3].T
        depth = ((4.0 - c2w[2, 3]) / dirs[..., 2]).astype(np.float32)
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        out.append(dict(img=img, depth=depth, K=K, c2w=c2w))
    return out


def write_synthetic_scene(root, name="scene0", n_views=6, h=32, w=48,
                          focal=40.0, seed=0):
    """Materialize a synthetic posed-RGBD scene in the dataset layout
    (fixture for tests and smoke pre-training runs)."""
    from instantsplat_tpu.data.images import save_image

    sdir = Path(root) / name
    (sdir / "images").mkdir(parents=True, exist_ok=True)
    (sdir / "depth").mkdir(parents=True, exist_ok=True)
    views = synthetic_views(n_views, h, w, focal, seed)
    names = []
    for v, view in enumerate(views):
        name_v = f"f{v:04d}"
        save_image(sdir / "images" / f"{name_v}.png",
                   view["img"].astype(np.float32) / 255.0)
        np.save(sdir / "depth" / f"{name_v}.npy", view["depth"])
        names.append(name_v)
    np.savez(sdir / "poses.npz",
             c2w=np.stack([v["c2w"] for v in views]),
             K=np.stack([v["K"] for v in views]),
             names=np.array(names))
    return sdir


def prefetch_iter(gen, depth: int = 2):
    """Background-thread batch prefetcher (the torch DataLoader pipelining
    role): assembles up to `depth` batches ahead while the consumer's train
    step runs. Order-preserving and exception-transparent — an exception in
    the producer re-raises at the consumer's next pull.

    When the consumer abandons the iterator early (generator .close() /
    GeneratorExit — e.g. the train loop hit --steps), the producer is told
    to stop and the wrapped generator is closed, so its resources (the
    dataset's num_workers thread pool, queued batches) are released instead
    of a worker thread blocking forever on a full queue."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    _END = object()
    stop = threading.Event()

    def put_or_abandoned(obj) -> bool:
        """Bounded put that notices consumer abandonment; True = delivered."""
        while not stop.is_set():
            try:
                q.put(obj, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in gen:
                if not put_or_abandoned(item):
                    break
            else:
                put_or_abandoned(_END)
        except BaseException as e:  # propagate into the consumer
            put_or_abandoned(e)
        finally:
            if stop.is_set():
                # run the generator's finally blocks (closes worker pools)
                close = getattr(gen, "close", None)
                if close is not None:
                    try:
                        close()
                    except Exception:
                        pass

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        # unblock a producer waiting on a full queue, then let it finish
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
