"""Tiled-rasterizer stage split: where does a tiled train iteration go?

Cumulative-probe method (each probe consumes every intermediate so XLA
cannot DCE earlier stages; stage cost = probe_k - probe_{k-1}), with
per-rep input perturbation + host-scalar sync (axon timing rules).

Stages probed on the small-splat plane scene (the regime the kernel was
built for): candidate extents+keys -> key sort -> slot/segment math ->
packed-row gather -> forward kernel -> backward kernel -> gradient fold.

  python scripts/bench_tiled_split.py [--n 400000] [--reps 8]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=400_000)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--hw", type=int, nargs=2, default=[384, 512])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from instantsplat_tpu.models.camera import Camera
    from instantsplat_tpu.ops import rasterize_pallas_tiled as rpt
    from instantsplat_tpu.ops.rasterize_pallas import _pack_gaussians
    from instantsplat_tpu.ops.rasterize_pallas_binned import _gather_binned
    from instantsplat_tpu.render.driver import (
        prepare_sorted_splats,
        tiled_view_requirements,
    )
    from instantsplat_tpu.models.gaussians import GaussianModel

    h, w = args.hw
    n = args.n
    # jittered-grid plane cloud (see bench_tiled._make_scene rationale);
    # numpy construction — eager jnp ops compile per-op over the tunnel
    rng = np.random.default_rng(0)
    side = int(np.ceil(np.sqrt(n)))
    gy, gx = np.meshgrid(np.arange(side), np.arange(side))
    g = (np.stack([gx, gy], -1).reshape(-1, 2)[:n] / side - 0.5) * 3.6
    xy = g + rng.standard_normal((n, 2)) * (0.2 * 3.6 / side)
    z = 6.0 + rng.standard_normal((n, 1)) * 0.05
    pts = jnp.asarray(np.concatenate([xy, z], 1), jnp.float32)
    cols = jnp.asarray(rng.random((n, 3)), jnp.float32)
    poses = jnp.tile(jnp.array([1.0, 0, 0, 0, 0, 0, 0]), (2, 1))
    params = GaussianModel.create_from_pcd(pts, cols, cam_poses=poses,
                                           max_sh_degree=3)
    params = params.replace(
        scaling=params.scaling + float(np.log(0.25)),
        opacity=jnp.full_like(params.opacity, 2.0))
    cam = Camera.create(np.eye(3), np.zeros(3), fx=400.0, fy=400.0,
                        height=h, width=w, uid=0)

    cf, dy_l, dx_l = tiled_view_requirements(params, params.get_pose(0),
                                             cam)
    print(json.dumps({"caps": [cf, dy_l, dx_l], "n": n}), flush=True)
    br, cw, gch = rpt.BLOCK_ROWS, rpt.COL_W, rpt.G_CHUNK
    w_pad = rpt._round_up(w, cw)
    h_pad = rpt._round_up(h, br)
    n_rb, n_cb = h_pad // br, w_pad // cw
    n_tiles = n_rb * n_cb
    cap = rpt._round_up(max(cf * n, gch) + n_tiles * gch, gch)
    tile_px = br * cw

    # frozen sorted splats as probe inputs (front-end not under test)
    (m2, cn, lo, col, dep, vd), _ = jax.jit(
        lambda p: prepare_sorted_splats(
            p, p.get_pose(0), cam.fx, cam.fy, cam.cx, cam.cy,
            jnp.float32(1.0), 3, h, w))(params)

    def consume(*xs):
        t = jnp.float32(0)
        for x in xs:
            t = t + jnp.sum(x.astype(jnp.float32)[..., :1])
        return t

    def build_upto(m2, stage):
        r = rpt._cutoff_radius(cn, lo, vd)
        ylo, yhi = rpt._extent_1d(m2[:, 1], r, br, n_rb)
        xlo, xhi = rpt._extent_1d(m2[:, 0], r, cw, n_cb)
        yhi_c = jnp.minimum(yhi, ylo + dy_l - 1)
        xhi_c = jnp.minimum(xhi, xlo + dx_l - 1)
        dyr = jnp.arange(dy_l, dtype=jnp.int32)
        dxr = jnp.arange(dx_l, dtype=jnp.int32)
        rbc = ylo[:, None] + dyr[None, :]
        cbc = xlo[:, None] + dxr[None, :]
        ok = ((rbc <= yhi_c[:, None])[:, :, None]
              & (cbc <= xhi_c[:, None])[:, None, :])
        tile = (jnp.clip(rbc, 0, n_rb - 1)[:, :, None] * n_cb
                + jnp.clip(cbc, 0, n_cb - 1)[:, None, :])
        gi = jnp.arange(n, dtype=jnp.int32)
        big = jnp.iinfo(jnp.int32).max
        keys = jnp.where(ok, tile * n + gi[:, None, None],
                         big).reshape(-1)
        if stage == "keys":
            return consume(keys)
        n_cand = keys.shape[0]
        sk, perm = jax.lax.sort(
            (keys, jnp.arange(n_cand, dtype=jnp.int32)), num_keys=1)
        if stage == "sort":
            return consume(sk, perm)
        out = rpt._build_tiles(m2, cn, lo, vd, h_pad, w_pad, cap,
                               dy_l, dx_l, br, cw, gch)
        slot_gauss, tmap, touched, overflow, inv_slot = out
        if stage == "slotmath":
            return consume(slot_gauss, tmap, inv_slot)
        packed = _pack_gaussians(m2, cn, lo, col, dep, vd, 0)
        binned = _gather_binned(packed, slot_gauss)
        if stage == "gather":
            return consume(binned, tmap, inv_slot)
        raise ValueError(stage)

    def full_fwd(m2):
        out = rpt.composite_tiles_2d(
            m2, cn, lo, col, dep, vd, height=h, width=w,
            cap_factor=cf, dy_levels=dy_l, dx_levels=dx_l)
        return consume(out.rgb, out.alpha, out.depth)

    def fwd_bwd(m2):
        def f(m2_, cn_, lo_, col_):
            out = rpt.composite_tiles_2d(
                m2_, cn_, lo_, col_, dep, vd, height=h, width=w,
                cap_factor=cf, dy_levels=dy_l, dx_levels=dx_l)
            return jnp.sum(out.rgb) + jnp.sum(out.alpha) + jnp.sum(
                out.depth)

        g = jax.grad(f, argnums=(0, 1, 2, 3))(m2, cn, lo, col)
        return consume(*g)

    probes = ([(s, lambda m2_, s=s: build_upto(m2_, s))
               for s in ("keys", "sort", "slotmath", "gather")]
              + [("full_fwd", full_fwd), ("fwd_bwd", fwd_bwd)])

    def timed(fn):
        j = jax.jit(fn)
        float(j(m2))
        t0 = time.perf_counter()
        for rr in range(args.reps):
            float(j(m2 * (1.0 + 1e-7 * (rr + 1))))
        return (time.perf_counter() - t0) / args.reps

    prev = 0.0
    rows = {}
    for name, fn in probes:
        t = timed(fn)
        rows[name] = t
        print(json.dumps({"stage": name, "cum_ms": round(t * 1e3, 2),
                          "delta_ms": round((t - prev) * 1e3, 2)}),
              flush=True)
        if name in ("keys", "sort", "slotmath", "gather"):
            prev = t
    print(json.dumps({
        "summary_ms": {k: round(v * 1e3, 2) for k, v in rows.items()},
        "bwd_plus_fold_ms": round((rows["fwd_bwd"] - rows["full_fwd"])
                                  * 1e3, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
