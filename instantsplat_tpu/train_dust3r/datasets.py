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


class PosedMultiViewDataset:
    def __init__(self, root, scenes=None, pair_window=3):
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

    def _load_view(self, scene, idx):
        from instantsplat_tpu.data.images import load_image

        name = scene["names"][idx]
        img = load_image(scene["dir"] / "images" / f"{name}.png")
        depth = np.load(scene["dir"] / "depth" / f"{name}.npy")
        K = scene["K"][idx]
        c2w = scene["c2w"][idx]
        h, w = depth.shape
        gx, gy = np.meshgrid(np.arange(w), np.arange(h))
        xy = np.stack([(gx - K[0, 2]) / K[0, 0],
                       (gy - K[1, 2]) / K[1, 1]], -1)
        pts_cam = np.concatenate(
            [xy * depth[..., None], depth[..., None]], -1)
        pts_world = pts_cam.reshape(-1, 3) @ c2w[:3, :3].T + c2w[:3, 3]
        return dict(
            img=img.astype(np.float32),
            pts3d=pts_world.reshape(h, w, 3).astype(np.float32),
            camera_pose=c2w,
            valid_mask=depth > 0,
        )

    def batches(self, batch_size, seed=0, n_epochs=1, shard=None):
        """Yield jnp-ready batch dicts; `shard=(rank, world)` splits the
        pair list across hosts (the DistributedSampler role)."""
        import jax.numpy as jnp

        for epoch in range(n_epochs):
            rng = np.random.default_rng(seed + epoch)
            order = rng.permutation(len(self.pairs))
            if shard is not None:
                rank, world = shard
                order = order[rank::world]
            for s in range(0, len(order) - batch_size + 1, batch_size):
                v1s, v2s = [], []
                for k in order[s:s + batch_size]:
                    si, i, j = self.pairs[k]
                    v1s.append(self._load_view(self.scenes[si], i))
                    v2s.append(self._load_view(self.scenes[si], j))

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
                yield dict(
                    img1=b1["img"], img2=b2["img"],
                    gt1=dict(pts3d=b1["pts3d"],
                             camera_pose=b1["camera_pose"],
                             valid_mask=b1["valid_mask"]),
                    gt2=dict(pts3d=b2["pts3d"],
                             camera_pose=b2["camera_pose"],
                             valid_mask=b2["valid_mask"]),
                )


def write_synthetic_scene(root, name="scene0", n_views=6, h=32, w=48,
                          focal=40.0, seed=0):
    """Materialize a synthetic posed-RGBD scene in the dataset layout
    (fixture for tests and smoke pre-training runs)."""
    from instantsplat_tpu.data.images import save_image

    rng = np.random.default_rng(seed)
    sdir = Path(root) / name
    (sdir / "images").mkdir(parents=True, exist_ok=True)
    (sdir / "depth").mkdir(parents=True, exist_ok=True)
    K = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]],
                 np.float32)
    c2ws, names = [], []
    gx, gy = np.meshgrid(np.arange(w), np.arange(h))
    for v in range(n_views):
        ang = 0.08 * v
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 3] = [np.sin(ang), 0, -0.2 * v]
        dirs = np.stack([(gx - w / 2) / focal, (gy - h / 2) / focal,
                         np.ones_like(gx)], -1) @ c2w[:3, :3].T
        lam = (4.0 - c2w[2, 3]) / dirs[..., 2]
        depth = lam.astype(np.float32)
        img = rng.random((h, w, 3)).astype(np.float32)
        name_v = f"f{v:04d}"
        save_image(sdir / "images" / f"{name_v}.png", img)
        np.save(sdir / "depth" / f"{name_v}.npy", depth)
        c2ws.append(c2w)
        names.append(name_v)
    np.savez(sdir / "poses.npz", c2w=np.stack(c2ws),
             K=np.tile(K, (n_views, 1, 1)), names=np.array(names))
    return sdir
