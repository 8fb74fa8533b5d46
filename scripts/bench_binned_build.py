#!/usr/bin/env python
"""Component split of the binned rasterizer's bin CONSTRUCTION
(VERDICT r3 item 5: sort + slot gather dominate the 54-62 ms forward).

Measures, at the weak-termination workload (N=100k, 384x512):
  a. extent + key emission        (plain VPU math)
  b. jnp.sort of N*D_LEVELS keys
  c. segment/slot index math      (searchsorted + arithmetic)
  d. g_sorted[src] [cap] gather
  e. packed[safe] row gather + column sets  (the [cap, 16] build)
  f. alternative: 16 per-column 1-D gathers
  g. whole _build_bins + _gather_binned fused (one jit)
plus the end-to-end binned forward for reference.

Timing: per-rep input perturbation + host-scalar sync (axon rules).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def measure(fn, args_fn, reps=10):
    out = fn(*args_fn(0))
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf[:1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for r in range(reps):
        out = fn(*args_fn(r + 1))
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf[:1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / reps


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp
    import numpy as np

    import instantsplat_tpu.ops.rasterize_pallas_binned as rb
    from instantsplat_tpu.ops.rasterize_pallas import _pack_gaussians

    N, H, W = 100_000, 384, 512
    h_pad = rb._round_up(H, rb.BLOCK_ROWS)
    cap = rb._round_up(rb.CAP_FACTOR * N, rb.G_CHUNK)
    D = rb.D_LEVELS
    rng = np.random.default_rng(0)
    mean2d0 = rng.uniform([0, 0], [W, H], (N, 2)).astype(np.float32)
    conic = jnp.tile(jnp.asarray([[0.05, 0.0, 0.05]], jnp.float32), (N, 1))
    log_op = jnp.full((N,), -3.0)  # weak termination regime
    colors = jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32))
    depth = jnp.asarray(np.sort(rng.uniform(1, 8, N)).astype(np.float32))
    valid = jnp.ones((N,), bool)

    mean2d_dev = jnp.asarray(mean2d0)  # device-resident: per-rep host
    # uploads of the [N,2] array would dominate the timings over the tunnel

    def m2(r):
        return mean2d_dev + jnp.float32(1e-4 * r)

    # --- a: extents + keys ---
    @jax.jit
    def keys_of(mean2d):
        lo, hi = rb._y_extent_blocks(mean2d, conic, log_op, valid, 0, h_pad)
        hi_c = jnp.minimum(hi, lo + D - 1)
        d = jnp.arange(D, dtype=jnp.int32)
        rbc = lo[:, None].astype(jnp.int32) + d[None, :]
        ok = rbc <= hi_c[:, None]
        g = jnp.arange(N, dtype=jnp.int32)
        return jnp.where(ok, rbc * N + g[:, None],
                         jnp.iinfo(jnp.int32).max).reshape(-1)

    t = measure(keys_of, lambda r: (m2(r),))
    print(json.dumps({"stage": "a extents+keys", "ms": round(t * 1e3, 2)}))

    keys = keys_of(m2(0))

    # --- b: sort ---
    @jax.jit
    def sort_of(k):
        return jnp.sort(k)

    t = measure(sort_of, lambda r: (keys + r,))
    print(json.dumps({"stage": f"b sort {N * D} keys",
                      "ms": round(t * 1e3, 2)}))
    sk = sort_of(keys)

    # --- c+d: slot math + index gather ---
    n_rb = h_pad // rb.BLOCK_ROWS

    @jax.jit
    def slots_of(sk):
        g_sorted = sk - (sk // N) * N
        bounds = jnp.arange(n_rb + 1, dtype=jnp.int32) * N
        edges = jnp.searchsorted(sk, bounds)
        start = edges[:-1]
        counts = edges[1:] - start
        padded = ((counts + rb.G_CHUNK - 1) // rb.G_CHUNK) * rb.G_CHUNK
        pstart = jnp.concatenate(
            [jnp.zeros(1, jnp.int32),
             jnp.cumsum(padded)[:-1].astype(jnp.int32)])
        total = jnp.sum(padded)
        s = jnp.arange(cap, dtype=jnp.int32)
        rb_slot = jnp.clip(
            jnp.searchsorted(pstart, s, side="right") - 1, 0, n_rb - 1)
        r = s - pstart[rb_slot]
        live = (r < counts[rb_slot]) & (s < total)
        src = jnp.clip(start[rb_slot] + r, 0, N * D - 1)
        return jnp.where(live, g_sorted[src], -1).astype(jnp.int32)

    t = measure(slots_of, lambda r: (sk + 0 * r,))
    print(json.dumps({"stage": "c+d slot math + src gather",
                      "ms": round(t * 1e3, 2)}))
    slot_gauss = slots_of(sk)

    packed = _pack_gaussians(m2(0), conic, log_op, colors, depth, valid, 0)

    # --- e: row gather ---
    @jax.jit
    def row_gather(packed, sg):
        return rb._gather_binned(packed, sg)

    t = measure(row_gather, lambda r: (packed + jnp.float32(1e-6 * r),
                                       slot_gauss))
    print(json.dumps({"stage": "e row gather [cap,16]",
                      "ms": round(t * 1e3, 2)}))

    # --- f: 16 column gathers ---
    @jax.jit
    def col_gather(packed, sg):
        safe = jnp.maximum(sg, 0)
        cols = [packed[:, c][safe] for c in range(16)]
        return jnp.stack(cols, axis=1)

    t = measure(col_gather, lambda r: (packed + jnp.float32(1e-6 * r),
                                       slot_gauss))
    print(json.dumps({"stage": "f 16 column gathers",
                      "ms": round(t * 1e3, 2)}))

    # --- g: full build fused ---
    @jax.jit
    def full_build(mean2d):
        pk = _pack_gaussians(mean2d, conic, log_op, colors, depth, valid, 0)
        sg, rbc, ovf, _inv = rb._build_bins(mean2d, conic, log_op, valid, 0,
                                      h_pad, cap)
        return rb._gather_binned(pk, sg), rbc

    t = measure(full_build, lambda r: (m2(r),))
    print(json.dumps({"stage": "g full bin build",
                      "ms": round(t * 1e3, 2)}))

    # --- reference: full binned forward ---
    @jax.jit
    def fwd(mean2d):
        return rb.composite_tiles_binned(
            mean2d, conic, log_op, colors, depth, valid,
            height=H, width=W).rgb

    t = measure(fwd, lambda r: (m2(r),), reps=6)
    print(json.dumps({"stage": "full binned forward",
                      "ms": round(t * 1e3, 2)}))
