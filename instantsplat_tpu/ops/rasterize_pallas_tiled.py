"""2-D tiled Pallas rasterizer: (row-block x column-bucket) gather lists.

V3 of the binned rasterizer (ops/rasterize_pallas_binned.py). The 1-D
binned kernel reproduces CUDA tile binning along Y only: every slot chunk
composites against a full-width [G, BLOCK_ROWS * W] pixel block, so on
small-splat scenes (the realistic fused-cloud regime: radius 3-7 px at
512-res) each Gaussian touches ~10 of the ~2048 pixels it is evaluated
against — ~0.5% useful occupancy, measured ~450 ms/iter on the 413k-splat
e2e scene (PERF_NOTES roadmap item 6). This version bins in BOTH image
dimensions, like the CUDA rasterizer's 16x16 tiles
(diff-gaussian-rasterization semantics behind gaussian_renderer/
__init__.py:126-135), restructured for the TPU:

- tiles are BLOCK_ROWS x COL_W pixels with COL_W a lane-width multiple
  (128) — the narrowest block the VPU can fill;
- candidates (Gaussian, tile) are enumerated per Gaussian over its
  alpha-cutoff extent RECTANGLE (dy_levels x dx_levels static levels),
  key-sorted by (tile, depth-rank) exactly like the 1-D construction —
  every tile's slot segment is contiguous and depth-ordered;
- the kernel walks slot chunks; a scalar-prefetch chunk->tile map drives
  the OUTPUT BlockSpec index maps, so each tile's accumulators live in
  VMEM only for that tile's consecutive chunk run (Pallas revisit
  semantics: a block is flushed when the index map changes; the sort
  guarantees each tile is one consecutive run). Per-pixel transmittance /
  done state is a [1, tile] scratch re-initialized at each run start —
  nothing image-sized stays resident, so there is no strip machinery and
  no VMEM cap on image size;
- tiles never touched by any chunk are filled host-side (acc=0, T=1)
  from the construction's per-tile counts;
- the backward walks chunks in reverse (per-tile back-to-front) and emits
  per-slot gradients folded to per-Gaussian by the same candidate->slot
  inverse-map gather as the 1-D kernel.

The round-2 "2D bins" experiment that was reverted predates the cheap
slot construction (round 4) and the scalar-prefetch output indexing used
here; see PERF_NOTES.md:118-129 vs 168-184 for why its conclusion does
not carry over.

Semantics are identical to the oracle (ops/rasterize.py) — validated by
the same test harness as the dense and 1-D binned kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from instantsplat_tpu.ops.rasterize import ALPHA_MAX, CompositeOut
from instantsplat_tpu.ops.rasterize_pallas import (
    _LOG_ALPHA_EPS,
    _LOG_TERM,
    _falloff,
    _pack_gaussians,
    _round_up,
)
from instantsplat_tpu.ops.rasterize_pallas import _cumsum_g, _tri
from instantsplat_tpu.ops.rasterize_pallas_binned import (
    _gather_binned,
    _scan_sub,
)

# Tile geometry: COL_W must be a lane multiple (128); BLOCK_ROWS trades
# per-splat waste (smaller = tighter y-culling) against slot duplication
# and chunk count (larger = fewer tiles). G_CHUNK amortizes the per-grid-
# step floor (~6 us) against per-tile alignment padding.
BLOCK_ROWS = 8
COL_W = 128
G_CHUNK = 256
CAP_FACTOR = 4  # slot capacity = CAP_FACTOR * N + per-tile alignment slack
DY_LEVELS = 4  # max row-blocks a Gaussian may span (extent clamp, flagged)
DX_LEVELS = 2  # max column-buckets a Gaussian may span
# Per-chunk prefix-sum implementation over the Gaussian (sublane) axis:
# "roll" = Hillis-Steele ladder of sublane rolls (O(log G) passes; Mosaic
# sublane rolls are slow), "mxu" = split-bf16x2 tri-matmul
# (rasterize_pallas._cumsum_g — 2 MXU passes, exact to f32 noise). A/B on
# device via scripts/bench_tiled.py.
SCAN_IMPL = "roll"


def _scan_g(x):
    if SCAN_IMPL == "mxu":
        return _cumsum_g(_tri(x.shape[0]), x)
    return _scan_sub(x)


def _cutoff_radius(conic, log_opacity, valid):
    """Alpha-cutoff screen radius (same math as the dense kernel's bitmap
    and the 1-D binned y-extent); r < 0 => contributes nowhere."""
    ca, cb, cc = conic[:, 0], conic[:, 1], conic[:, 2]
    det = ca * cc - cb * cb
    ok = valid & (det > 0.0) & (ca > 0.0)
    tr_cov = jnp.where(ok, (ca + cc) / jnp.maximum(det, 1e-30), 0.0)
    det_cov = jnp.where(ok, 1.0 / jnp.maximum(det, 1e-30), 0.0)
    mid = 0.5 * tr_cov
    lam_max = mid + jnp.sqrt(jnp.maximum(mid * mid - det_cov, 0.0))
    m = jnp.maximum(log_opacity - _LOG_ALPHA_EPS, 0.0)
    r = jnp.sqrt(2.0 * m * lam_max) * 1.001 + 1.0
    return jnp.where(ok & (m > 0.0), r, -1.0)


def _extent_1d(center, r, block: int, n_blocks: int):
    """Inclusive block range [lo, hi] covered by center +- r (hi < lo =>
    touches nothing; returns (1, 0) for r < 0)."""
    lo = jnp.clip(jnp.floor((center - r) / block).astype(jnp.int32),
                  0, n_blocks)
    hi = jnp.clip(jnp.floor((center + r) / block).astype(jnp.int32),
                  -1, n_blocks - 1)
    return jnp.where(r < 0, 1, lo), jnp.where(r < 0, 0, hi)


def _build_tiles(mean2d, conic, log_opacity, valid, h_pad, w_pad, cap,
                 dy_levels: int, dx_levels: int, br: int, cw: int, gch: int):
    """-> (slot_gauss [cap] int32 global sorted index or -1,
           tmap [cap//gch] int32 tile id (n_tiles = dead/dummy),
           touched [n_tiles] bool,
           overflow bool,
           inv_slot [N * dy_levels * dx_levels] candidate->slot map).

    Same scatter-free construction as the 1-D binned kernel
    (rasterize_pallas_binned._build_bins) generalized to tile rectangles,
    with the per-SLOT segment lookups replaced by per-CHUNK ones (chunks
    never straddle tiles, so every slot in a chunk shares its segment
    tables — [n_chunks] gathers instead of [cap, n_tiles] comparison
    matrices, which stop scaling past ~100 segments).
    """
    n = mean2d.shape[0]
    n_rb = h_pad // br
    n_cb = w_pad // cw
    n_tiles = n_rb * n_cb
    r = _cutoff_radius(conic, log_opacity, valid)
    ylo, yhi = _extent_1d(mean2d[:, 1], r, br, n_rb)
    xlo, xhi = _extent_1d(mean2d[:, 0], r, cw, n_cb)
    yhi_c = jnp.minimum(yhi, ylo + dy_levels - 1)
    xhi_c = jnp.minimum(xhi, xlo + dx_levels - 1)
    ext_overflow = jnp.any((yhi > yhi_c) | (xhi > xhi_c))

    dy = jnp.arange(dy_levels, dtype=jnp.int32)
    dx = jnp.arange(dx_levels, dtype=jnp.int32)
    rbc = ylo[:, None] + dy[None, :]  # [N, Dy]
    cbc = xlo[:, None] + dx[None, :]  # [N, Dx]
    ok = ((rbc <= yhi_c[:, None])[:, :, None]
          & (cbc <= xhi_c[:, None])[:, None, :])
    tile = (jnp.clip(rbc, 0, n_rb - 1)[:, :, None] * n_cb
            + jnp.clip(cbc, 0, n_cb - 1)[:, None, :])  # [N, Dy, Dx]
    gidx = jnp.arange(n, dtype=jnp.int32)
    big = jnp.iinfo(jnp.int32).max
    # key = tile * N + g: each tile's run is depth-ordered because g is
    # the depth-sorted index. Callers guarantee n_tiles * N < 2^31
    # (composite_tiles_2d raises otherwise).
    keys = jnp.where(ok, tile * n + gidx[:, None, None], big).reshape(-1)
    n_cand = keys.shape[0]
    sk, perm = jax.lax.sort(
        (keys, jnp.arange(n_cand, dtype=jnp.int32)), num_keys=1)
    g_sorted = sk - (sk // n) * n  # == sk % n for valid entries

    bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * n
    edges = jnp.searchsorted(sk, bounds).astype(jnp.int32)  # [n_tiles + 1]
    start = edges[:-1]
    counts = edges[1:] - start
    padded = ((counts + gch - 1) // gch) * gch
    pstart = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(padded)[:-1].astype(jnp.int32)])
    total = jnp.sum(padded)
    overflow = (total > cap) | ext_overflow

    # chunk -> tile: last tile whose padded segment starts at or before
    # the chunk ('right' side skips empty tiles, whose pstart repeats)
    n_chunks = cap // gch
    c0 = jnp.arange(n_chunks, dtype=jnp.int32) * gch
    seg = jnp.clip(jnp.searchsorted(pstart, c0, side="right") - 1,
                   0, n_tiles - 1).astype(jnp.int32)
    tmap = jnp.where(c0 < total, seg, n_tiles).astype(jnp.int32)

    # per-chunk segment tables ([n_chunks] gathers from [n_tiles])
    start_c = start[seg]
    counts_c = counts[seg]
    pstart_c = pstart[seg]
    lane = jnp.arange(gch, dtype=jnp.int32)
    rank = (c0 - pstart_c)[:, None] + lane[None, :]  # [n_chunks, gch]
    live = (rank < counts_c[:, None]) & ((c0[:, None] + lane[None, :])
                                         < total)
    # slots of one chunk read a CONTIGUOUS run of the sorted array —
    # a [n_chunks]-row slice-gather, not a [cap]-element one
    gs_pad = jnp.concatenate([g_sorted, jnp.zeros(gch, jnp.int32)])
    base = jnp.clip(start_c + (c0 - pstart_c), 0, n_cand)
    rows = jax.vmap(
        lambda b: jax.lax.dynamic_slice(gs_pad, (b,), (gch,)))(base)
    slot_gauss = jnp.where(live, rows, -1).reshape(cap).astype(jnp.int32)

    # candidate -> slot inverse map (backward's gather-based gradient
    # fold; see rasterize_pallas_binned._build_bins for the derivation):
    # tables expand over sorted positions via an [n_tiles]-element
    # scatter + cumsum, then one (perm, slot) sort restores candidate
    # order.
    def expand(table):
        delta = jnp.concatenate([table[:1], table[1:] - table[:-1]])
        seed = jnp.zeros(n_cand, jnp.int32).at[edges[:-1]].add(delta)
        return jnp.cumsum(seed)

    pos = jnp.arange(n_cand, dtype=jnp.int32)
    rank_p = pos - expand(start)
    slot_pos = expand(pstart) + rank_p
    valid_p = (sk < big) & (slot_pos < cap)
    _, inv_slot = jax.lax.sort(
        (perm, jnp.where(valid_p, slot_pos, -1)), num_keys=1)
    return slot_gauss, tmap, counts > 0, overflow, inv_slot


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(
    n_cb: int, br: int, cw: int, n_tiles: int,
    tmap_ref,  # SMEM [n_chunks] int32 (scalar prefetch): tile or n_tiles
    gauss_ref,  # VMEM [G, 16] packed slot chunk (col 10 = global index)
    acc_ref,  # out block [1, 4, T]
    tfin_ref,  # out block [1, 1, T] (tile-singleton leading dims keep the
    # Mosaic block rule: every blocked trailing dim equals its array dim)
    lc_ref,  # out block [1, 1, T] int32
    logt_ref,  # scratch [1, T]
    done_ref,  # scratch [1, T]
    tdone_ref,  # scratch SMEM [1]
):
    c = pl.program_id(0)
    n_chunks = pl.num_programs(0)
    t = tmap_ref[c]
    prev_t = tmap_ref[jnp.maximum(c - 1, 0)]
    next_t = tmap_ref[jnp.minimum(c + 1, n_chunks - 1)]
    is_start = (c == 0) | (t != prev_t)
    is_end = (c == n_chunks - 1) | (t != next_t)
    alive = t < n_tiles
    tile_px = logt_ref.shape[1]

    @pl.when(alive & is_start)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        lc_ref[:] = jnp.full(lc_ref.shape, -1, jnp.int32)
        logt_ref[:] = jnp.zeros_like(logt_ref)
        done_ref[:] = jnp.zeros_like(done_ref)
        tdone_ref[0] = 0

    @pl.when(alive & (tdone_ref[0] == 0))
    def _composite():
        blk = gauss_ref[:]
        rb = t // n_cb
        cb = t - rb * n_cb
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, tile_px), 1)
        px = (cb * cw + idx % cw).astype(jnp.float32)
        py = (rb * br + idx // cw).astype(jnp.float32)
        _, _, _, alpha = _falloff(blk, px, py)
        hit = alpha > 0.0
        l = jnp.where(hit, jnp.log1p(-alpha), 0.0)
        cum = _scan_g(l)
        logt_row = logt_ref[:]
        logt_post = logt_row + cum
        done_row = done_ref[:]
        contribute = hit & (done_row < 0.5) & (logt_post >= _LOG_TERM)
        w = jnp.where(contribute, alpha * jnp.exp(logt_post - l), 0.0)
        for ch in range(4):
            ch_contrib = jnp.sum(
                w * blk[:, 6 + ch : 7 + ch], 0, keepdims=True)
            acc_ref[0, ch : ch + 1, :] = (
                acc_ref[0, ch : ch + 1, :] + ch_contrib)
        logt_ref[:] = jnp.min(
            jnp.where(contribute, logt_post, logt_row), 0, keepdims=True)
        gidx = blk[:, 10:11].astype(jnp.int32)
        lc_ref[0] = jnp.maximum(
            lc_ref[0],
            jnp.max(jnp.where(contribute, gidx, -1), 0, keepdims=True))
        fired = (hit & (logt_post < _LOG_TERM)).astype(jnp.float32)
        new_done = jnp.maximum(done_row, jnp.max(fired, 0, keepdims=True))
        done_ref[:] = new_done
        tdone_ref[0] = jnp.min(new_done).astype(jnp.int32)

    @pl.when(alive & is_end)
    def _final():
        tfin_ref[0] = jnp.exp(logt_ref[:])


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(
    n_cb: int, br: int, cw: int, n_tiles: int,
    tmap_ref,  # SMEM [n_chunks] int32
    gauss_ref,  # VMEM [G, 16] — chunk n_chunks-1-c
    g4_ref,  # VMEM block [1, 4, T]
    gtu_ref,  # VMEM block [1, 1, T]
    tfin_ref,  # VMEM block [1, 1, T]
    lc_ref,  # VMEM block [1, 1, T] int32
    dgauss_ref,  # out [G, 10] — per-slot grads, chunk n_chunks-1-c
    ss_ref,  # scratch [1, T]
    logtr_ref,  # scratch [1, T]
):
    c = pl.program_id(0)
    n_chunks = pl.num_programs(0)
    k = n_chunks - 1 - c
    t = tmap_ref[k]
    prev_t = tmap_ref[jnp.minimum(k + 1, n_chunks - 1)]  # prev in walk order
    is_rstart = (c == 0) | (t != prev_t)
    alive = t < n_tiles
    tile_px = ss_ref.shape[1]
    g = gauss_ref.shape[0]

    dgauss_ref[:] = jnp.zeros_like(dgauss_ref)

    @pl.when(alive & is_rstart)
    def _init():
        ss_ref[:] = jnp.zeros_like(ss_ref)
        logtr_ref[:] = jnp.log(jnp.maximum(tfin_ref[0], 1e-30))

    def live_body():
        blk = gauss_ref[:]
        lc_row = lc_ref[0]
        gidx = blk[:, 10:11].astype(jnp.int32)
        rb = t // n_cb
        cb = t - rb * n_cb
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, tile_px), 1)
        px = (cb * cw + idx % cw).astype(jnp.float32)
        py = (rb * br + idx // cw).astype(jnp.float32)
        dxp, dyp, a_un, alpha = _falloff(blk, px, py)
        contribute = (alpha > 0.0) & (gidx <= lc_row)
        om = jnp.where(contribute, 1.0 - alpha, 1.0)
        l = jnp.where(contribute, jnp.log1p(-alpha), 0.0)
        cum = _scan_g(l)
        total_l = cum[g - 1 : g, :]
        csuf = total_l - cum + l
        logt_end = logtr_ref[:]
        t_at = jnp.exp(logt_end - csuf)
        w = jnp.where(contribute, alpha * t_at, 0.0)

        b1 = jnp.zeros_like(alpha)
        for ch in range(4):
            b1 = b1 + blk[:, 6 + ch : 7 + ch] * g4_ref[0, ch : ch + 1, :]
        e = w * b1
        ecum = _scan_g(e)
        etot = ecum[g - 1 : g, :]
        esuf = etot - ecum

        ss_row = ss_ref[:]
        gtu_row = gtu_ref[0]
        dalpha = jnp.where(
            contribute,
            b1 * t_at - (ss_row + gtu_row + esuf) / om,
            0.0,
        )
        dpow = dalpha * jnp.where(a_un < ALPHA_MAX, a_un, 0.0)
        ca, cb_, cc = blk[:, 2:3], blk[:, 3:4], blk[:, 4:5]
        dmx = jnp.sum(dpow * (ca * dxp + cb_ * dyp), 1, keepdims=True)
        dmy = jnp.sum(dpow * (cc * dyp + cb_ * dxp), 1, keepdims=True)
        dca = jnp.sum(dpow * (-0.5 * dxp * dxp), 1, keepdims=True)
        dcb = jnp.sum(dpow * (-dxp * dyp), 1, keepdims=True)
        dcc = jnp.sum(dpow * (-0.5 * dyp * dyp), 1, keepdims=True)
        dlo = jnp.sum(dpow, 1, keepdims=True)
        dc4 = [
            jnp.sum(w * g4_ref[0, ch : ch + 1, :], 1, keepdims=True)
            for ch in range(4)
        ]
        # 10 real gradient columns only — the padding columns of the
        # packed layout would be dead weight in the bwd output + the
        # fold's row gather (row bytes are the gather's cost driver)
        delta = jnp.concatenate(
            [dmx, dmy, dca, dcb, dcc, dlo, *dc4], axis=1)
        dgauss_ref[:] = delta
        ss_ref[:] = ss_row + etot
        logtr_ref[:] = logt_end - total_l

    @pl.when(alive)
    def _():
        lc_row = lc_ref[0]

        @pl.when(jnp.max(lc_row) >= 0)
        def _():
            live_body()


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------


def _run_fwd(binned, tmap, n_tiles, tile_px, br, cw, n_cb, interpret):
    gch = G_CHUNK
    n_chunks = binned.shape[0] // gch
    kernel = functools.partial(_fwd_kernel, n_cb, br, cw, n_tiles)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((gch, 16), lambda c, m: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 4, tile_px), lambda c, m: (m[c], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_px), lambda c, m: (m[c], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_px), lambda c, m: (m[c], 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, tile_px), jnp.float32),
            pltpu.VMEM((1, tile_px), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles + 1, 4, tile_px), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles + 1, 1, tile_px), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles + 1, 1, tile_px), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(tmap, binned)


def _run_bwd(binned, tmap, g4, gtu, tfin, lc, n_tiles, tile_px, br, cw,
             n_cb, interpret):
    cap = binned.shape[0]
    n_chunks = cap // G_CHUNK
    rev = lambda c, m: (n_chunks - 1 - c, 0)  # noqa: E731
    revt3 = lambda c, m: (m[n_chunks - 1 - c], 0, 0)  # noqa: E731
    kernel = functools.partial(_bwd_kernel, n_cb, br, cw, n_tiles)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((G_CHUNK, 16), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, tile_px), revt3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_px), revt3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_px), revt3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_px), revt3, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G_CHUNK, 10), rev,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, tile_px), jnp.float32),
            pltpu.VMEM((1, tile_px), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((cap, 10), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(tmap, binned, g4, gtu, tfin, lc)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def _composite_tiled(
    mean2d, conic, log_opacity, colors, depth, valid,
    h_pad: int, w_pad: int, cap: int, dy_levels: int, dx_levels: int,
    interpret: bool,
):
    out, _ = _composite_tiled_fwd(
        mean2d, conic, log_opacity, colors, depth, valid,
        h_pad, w_pad, cap, dy_levels, dx_levels, interpret,
    )
    return out


def _composite_tiled_fwd(
    mean2d, conic, log_opacity, colors, depth, valid,
    h_pad, w_pad, cap, dy_levels, dx_levels, interpret,
):
    n = mean2d.shape[0]
    br, cw = BLOCK_ROWS, COL_W
    n_rb = h_pad // br
    n_cb = w_pad // cw
    n_tiles = n_rb * n_cb
    tile_px = br * cw
    packed = _pack_gaussians(
        mean2d, conic, log_opacity, colors, depth, valid, 0)
    slot_gauss, tmap, touched, overflow, inv_slot = _build_tiles(
        mean2d, conic, log_opacity, valid, h_pad, w_pad, cap,
        dy_levels, dx_levels, br, cw, G_CHUNK)
    binned = _gather_binned(packed, slot_gauss)

    acc_f, tfin_f, lc_f = _run_fwd(
        binned, tmap, n_tiles, tile_px, br, cw, n_cb, interpret)
    # tiles no chunk visited hold uninitialized memory: fill host-side
    acc = jnp.where(touched[:, None, None], acc_f[:n_tiles], 0.0)
    tfin = jnp.where(touched[:, None], tfin_f[:n_tiles, 0], 1.0)
    residuals = (binned, tmap, inv_slot, tfin_f, lc_f, touched, n)
    return (acc, tfin, overflow), residuals


def _composite_tiled_bwd(h_pad, w_pad, cap, dy_levels, dx_levels,
                         interpret, residuals, cots):
    binned, tmap, inv_slot, tfin_f, lc_f, touched, n = residuals
    g_acc, g_tfin, _ = cots
    br, cw = BLOCK_ROWS, COL_W
    n_rb = h_pad // br
    n_cb = w_pad // cw
    n_tiles = n_rb * n_cb
    tile_px = br * cw
    if g_acc is None:
        g_acc = jnp.zeros((n_tiles, 4, tile_px), jnp.float32)
    if g_tfin is None:
        g_tfin = jnp.zeros((n_tiles, tile_px), jnp.float32)
    gtu = (g_tfin * tfin_f[:n_tiles, 0])[:, None, :]
    # pad a dummy row so tmap's dead index stays in range
    g4 = jnp.concatenate(
        [g_acc, jnp.zeros((1, 4, tile_px), jnp.float32)], axis=0)
    gtu = jnp.concatenate(
        [gtu, jnp.zeros((1, 1, tile_px), jnp.float32)], axis=0)

    dslots = _run_bwd(binned, tmap, g4, gtu, tfin_f, lc_f, n_tiles,
                      tile_px, br, cw, n_cb, interpret)
    d = dy_levels * dx_levels
    inv = inv_slot.reshape(n, d)
    rows10 = dslots[jnp.maximum(inv, 0)]  # [n, d, 10]
    dgauss = jnp.sum(
        jnp.where((inv >= 0)[..., None], rows10, 0.0), axis=1)
    return (
        dgauss[:, 0:2],
        dgauss[:, 2:5],
        dgauss[:, 5],
        dgauss[:, 6:9],
        dgauss[:, 9],
        None,
    )


_composite_tiled.defvjp(_composite_tiled_fwd, _composite_tiled_bwd)


def composite_tiles_2d(
    mean2d, conic, log_opacity, colors, depth, valid,
    height: int, width: int, bg=None, interpret: bool | None = None,
    cap_factor: int | None = None, dy_levels: int | None = None,
    dx_levels: int | None = None,
) -> CompositeOut:
    """Drop-in replacement for rasterize.composite / composite_tiles."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = mean2d.shape[0]
    br, cw = BLOCK_ROWS, COL_W
    w_pad = _round_up(width, cw)
    h_pad = _round_up(height, br)
    n_rb = h_pad // br
    n_cb = w_pad // cw
    n_tiles = n_rb * n_cb
    if n_tiles * (n + 1) >= 2**31:
        raise ValueError(
            f"tiled rasterizer key space overflow: {n_tiles} tiles x "
            f"{n} splats needs > int32 keys; use the 1-D binned or dense "
            "backend for this shape")
    cf = CAP_FACTOR if cap_factor is None else cap_factor
    dy_l = DY_LEVELS if dy_levels is None else dy_levels
    dx_l = DX_LEVELS if dx_levels is None else dx_levels
    # room for per-tile G-alignment padding on top of cf * N slots
    cap = _round_up(max(cf * n, G_CHUNK) + n_tiles * G_CHUNK, G_CHUNK)

    acc, tfin, _ = _composite_tiled(
        mean2d, conic, log_opacity, colors, depth, valid,
        h_pad, w_pad, cap, dy_l, dx_l, interpret,
    )
    # [n_tiles, 4, T] tile layout -> [4, H, W]
    acc_img = acc.reshape(n_rb, n_cb, 4, br, cw).transpose(
        2, 0, 3, 1, 4).reshape(4, h_pad, w_pad)[:, :height, :width]
    tfin_img = tfin.reshape(n_rb, n_cb, br, cw).transpose(
        0, 2, 1, 3).reshape(h_pad, w_pad)[:height, :width]

    rgb = jnp.moveaxis(acc_img[:3], 0, -1)
    if bg is not None:
        rgb = rgb + tfin_img[:, :, None] * bg[None, None, :]
    return CompositeOut(rgb=rgb, alpha=1.0 - tfin_img, depth=acc_img[3])


def tile_overflow(
    mean2d, conic, log_opacity, valid, height: int, width: int,
    cap_factor: int | None = None, dy_levels: int | None = None,
    dx_levels: int | None = None,
):
    """Diagnostic: True if the tiled rasterizer would drop pairs for this
    scene (capacity or extent-clamp exhaustion)."""
    br, cw = BLOCK_ROWS, COL_W
    h_pad = _round_up(height, br)
    w_pad = _round_up(width, cw)
    cf = CAP_FACTOR if cap_factor is None else cap_factor
    dy_l = DY_LEVELS if dy_levels is None else dy_levels
    dx_l = DX_LEVELS if dx_levels is None else dx_levels
    n = mean2d.shape[0]
    n_tiles = (h_pad // br) * (w_pad // cw)
    cap = _round_up(max(cf * n, G_CHUNK) + n_tiles * G_CHUNK, G_CHUNK)
    _, _, _, overflow, _ = _build_tiles(
        mean2d, conic, log_opacity, valid, h_pad, w_pad, cap,
        dy_l, dx_l, br, cw, G_CHUNK)
    return overflow


@functools.partial(jax.jit, static_argnames=("height", "width"))
def _tile_requirements_impl(mean2d, conic, log_opacity, valid,
                            height: int, width: int):
    """(cap_factor float, dy int, dx int) this scene state needs for a
    drop-free tiled build — the 2-D analogue of
    rasterize_pallas_binned._bin_requirements_impl. Per-tile counts come
    from a 2-D difference array (4 corner scatter-adds + double cumsum)."""
    n = mean2d.shape[0]
    br, cw, gch = BLOCK_ROWS, COL_W, G_CHUNK
    h_pad = _round_up(height, br)
    w_pad = _round_up(width, cw)
    n_rb = h_pad // br
    n_cb = w_pad // cw
    r = _cutoff_radius(conic, log_opacity, valid)
    ylo, yhi = _extent_1d(mean2d[:, 1], r, br, n_rb)
    xlo, xhi = _extent_1d(mean2d[:, 0], r, cw, n_cb)
    ext_y = jnp.maximum(yhi - ylo + 1, 0)
    ext_x = jnp.maximum(xhi - xlo + 1, 0)
    live = (ext_y > 0) & (ext_x > 0)
    one = jnp.where(live, 1, 0).astype(jnp.int32)
    y0 = jnp.clip(ylo, 0, n_rb)
    y1 = jnp.clip(yhi + 1, 0, n_rb)
    x0 = jnp.clip(xlo, 0, n_cb)
    x1 = jnp.clip(xhi + 1, 0, n_cb)
    diff = jnp.zeros((n_rb + 1, n_cb + 1), jnp.int32)
    diff = diff.at[y0, x0].add(one)
    diff = diff.at[y0, x1].add(-one)
    diff = diff.at[y1, x0].add(-one)
    diff = diff.at[y1, x1].add(one)
    counts = jnp.cumsum(jnp.cumsum(diff, axis=0), axis=1)[:n_rb, :n_cb]
    padded = ((counts + gch - 1) // gch) * gch
    # alignment slack is re-added by composite_tiles_2d's capacity formula
    need = jnp.maximum(jnp.sum(padded) - n_rb * n_cb * gch, 0)
    return (need.astype(jnp.float32) / n, jnp.max(ext_y), jnp.max(ext_x))


def sizing_margin_2d(cf_raw: float, dy_raw: int,
                     dx_raw: int) -> tuple[int, int, int]:
    """Raw drop-free (cap_factor, dy, dx) -> capacities with margin for
    scene drift during training. The candidate-key sort is
    O(N * dy * dx), so the level margins stay at +1 with low floors —
    the trainer's periodic re-probe re-sizes against the live scene and
    rebuilds on growth (pipelines.trainer), so margins only need to
    bound 250 iterations of drift."""
    import math

    dy, dx = int(dy_raw), int(dx_raw)
    # proportional drift headroom, like the binned kernel's (big-level
    # scenes drift fastest; flat +1 forced a rebuild every window)
    return (max(CAP_FACTOR, math.ceil(float(cf_raw)) + 1),
            max(3, dy + max(1, dy // 4)),
            max(2, dx + max(1, dx // 4)))


def tile_requirements(mean2d, conic, log_opacity, valid,
                      height: int, width: int) -> tuple[int, int, int]:
    """Host-side sizing for backend auto-selection: the (cap_factor,
    dy_levels, dx_levels) that make the tiled rasterizer drop-free for
    THIS scene state, plus drift margin."""
    cf, dy, dx = _tile_requirements_impl(
        mean2d, conic, log_opacity, valid, height, width)
    return sizing_margin_2d(float(cf), int(dy), int(dx))
