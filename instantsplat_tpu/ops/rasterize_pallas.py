"""Pallas TPU tile rasterizer: differentiable Gaussian compositing kernels.

TPU-native equivalent of the reference CUDA `diff-gaussian-rasterization`
submodule (call site gaussian_renderer/__init__.py:126-135). Same compositing
semantics as the pure-jnp oracle (ops/rasterize.py — alpha clamp 0.99, 1/255
cutoff, latched 1e-4 transmittance termination), but structured for the TPU
memory model instead of CUDA tiles + global atomics:

- Gaussians are depth-sorted globally and processed in fixed-size chunks
  (G per grid step) by a 1-D pallas grid; the full pixel strip's compositing
  state (rgb+depth accumulators, log-transmittance, done latch,
  last-contributor index) stays resident in VMEM across grid steps, stored
  [n_row_blocks, P] so each row block is an aligned sublane slice.
- The in-chunk prefix sum over log-transmittance — the sequential dependence
  the CUDA kernel resolves with a per-pixel loop — is one lower-triangular
  [G, G] x [G, P] matmul on the MXU per row block.
- The termination latch needs no second scan: in-chunk transmittance is
  monotonically non-increasing, so "fired at-or-before j" is exactly
  logT_post_j < log(1e-4), and the carried T (which excludes the firing
  Gaussian, matching the CUDA `continue`) never crosses the threshold.
- Within a chunk, pixels advance in row blocks; a device-computed
  (row-block x chunk) bitmap — each Gaussian's y-extent at its alpha-cutoff
  radius — skips blocks a chunk cannot touch, and a per-row-block
  "all pixels terminated" latch skips saturated blocks (this replaces CUDA
  per-tile binning + per-thread early exit).
- Backward is a second kernel walking chunks back-to-front (the standard
  3DGS backward): per pixel it reconstructs each Gaussian's incident
  transmittance from the stored final T and the in-chunk suffix of log
  opacities, excludes post-latch Gaussians via the stored last-contributor
  index, and accumulates the suffix-color dot products needed for d(alpha).

Gradients flow to mean2d, conic, opacity, color, and per-Gaussian depth; the
projection / SH / pose math stays in plain JAX outside this custom_vjp
boundary, so camera-pose gradients (InstantSplat's key requirement,
gaussian_renderer/__init__.py:81-90) are handled by autodiff upstream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from instantsplat_tpu.ops.rasterize import (
    ALPHA_EPS,
    ALPHA_MAX,
    LOG_TERM,
    CompositeOut,
)

# Tunables: G Gaussians per grid step (sublane axis), BLOCK_ROWS image rows
# per inner pixel block (pixels = BLOCK_ROWS * padded width on the lane
# axis), strips of at most STRIP_ROWS rows bound resident VMEM state.
G_CHUNK = 128
CHUNKS_PER_STEP = 8  # chunks walked per grid step (one DMA block of
# CHUNKS_PER_STEP * G_CHUNK Gaussians); amortizes the ~6 us/grid-step floor
# that dominates termination-saturated forwards (782 -> 98 steps at N=100k)
# while keeping the [G_CHUNK, P] compute granularity Mosaic compiles well.
BLOCK_ROWS = 4
STRIP_ROWS = 256
_LOG_ALPHA_EPS = float(jnp.log(ALPHA_EPS))
_LOG_TERM = float(LOG_TERM)
# Precision of the MXU prefix-sum matmuls. DEFAULT (one bf16 pass) is far
# too coarse for accumulated log-transmittance (contributor sets flip near
# the termination threshold, measured ~0.9 image error); Mosaic supports
# only DEFAULT and HIGHEST, so HIGHEST it is. The binned kernel avoids the
# matmul entirely (lane-roll scan).
MATMUL_PRECISION = jax.lax.Precision.HIGHEST


def _dot_kwargs():
    return dict(preferred_element_type=jnp.float32,
                precision=MATMUL_PRECISION)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _tri(g: int):
    """Lower-triangular ones (inclusive diagonal): cumsum-as-matmul operand."""
    r = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
    return (r >= c).astype(jnp.float32)


def _cumsum_g(tri, x):
    """Inclusive prefix sum along the Gaussian (sublane) axis via the MXU.

    Split-bf16x2 evaluation: x = hi + lo with hi = bf16(x) (exactly
    representable), lo = x - hi. tri is 0/1 (exact in bf16), so each
    DEFAULT-precision pass computes exact products with f32 accumulation;
    the only error is lo's own bf16 truncation (~2^-17 relative) — within
    float32 noise for this sum at one third the MXU passes of
    Precision.HIGHEST (2 vs 6).
    """
    if MATMUL_PRECISION == jax.lax.Precision.HIGHEST:
        hi = x.astype(jnp.bfloat16).astype(jnp.float32)
        lo = x - hi
        dims = (((1,), (0,)), ((), ()))
        return (
            jax.lax.dot_general(tri, hi, dims,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(tri, lo, dims,
                                  preferred_element_type=jnp.float32)
        )
    return jax.lax.dot_general(
        tri, x, (((1,), (0,)), ((), ())), **_dot_kwargs())


def _falloff(blk, px, py):
    """Shared falloff math: [G, P] power/alpha from a packed Gaussian block.

    Column layout of `blk` [G, 16]: 0 mx, 1 my, 2 conic_a, 3 conic_b,
    4 conic_c, 5 log_opacity (-inf for invalid/padding), 6:10 (r, g, b,
    depth).
    """
    mx, my = blk[:, 0:1], blk[:, 1:2]
    ca, cb, cc = blk[:, 2:3], blk[:, 3:4], blk[:, 4:5]
    lo = blk[:, 5:6]
    dx = px - mx  # [1, P] - [G, 1] -> [G, P]
    dy = py - my
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    a_un = jnp.exp(power + lo)
    alpha = jnp.minimum(ALPHA_MAX, a_un)
    alpha = jnp.where((power > 0.0) | (alpha < ALPHA_EPS), 0.0, alpha)
    return dx, dy, a_un, alpha


def _pixel_coords(rb, n_pix, width, y0=0):
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, n_pix), 1)
    px = (idx % width).astype(jnp.float32)
    py = (y0 + rb * BLOCK_ROWS + idx // width).astype(jnp.float32)
    return px, py


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(
    bits_ref,  # SMEM [n_strips * n_rb, n_words] int32 (scalar prefetch)
    gauss_ref,  # VMEM [G, 16] packed chunk (depth-sorted)
    acc_ref,  # out [1, 4, n_rb, P] rgb+depth accumulators (strip block)
    tfin_ref,  # out [1, n_rb, P] final transmittance
    lc_ref,  # out [1, n_rb, P] int32 last contributing (global sorted) idx
    logt_ref,  # scratch [n_rb, P] log transmittance carry
    done_ref,  # scratch [n_rb, P] f32 0/1 latched termination
    rowdone_ref,  # scratch SMEM [n_rb] int32
    ndone_ref,  # scratch SMEM [1] int32: #row blocks fully terminated
    *,
    y0: int = 0,  # static row offset (packed-input path pre-shifts: 0)
):
    # grid = (n_strips, n_steps): the strip axis is OUTER, so each strip's
    # output blocks stay VMEM-resident across its whole chunk walk and the
    # pipeline flushes/loads them only at strip boundaries — one dispatch
    # composites an image of ANY height with bounded VMEM (the round-3
    # STRIP_ROWS residency cap, lifted).
    s = pl.program_id(0)
    c = pl.program_id(1)
    n_steps = pl.num_programs(1)
    n_rb, n_pix = logt_ref.shape
    cps = gauss_ref.shape[0] // G_CHUNK
    g = G_CHUNK
    width = n_pix // BLOCK_ROWS
    strip_y0 = y0 + s * n_rb * BLOCK_ROWS

    @pl.when(c == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        lc_ref[:] = jnp.full(lc_ref.shape, -1, jnp.int32)
        logt_ref[:] = jnp.zeros_like(logt_ref)
        done_ref[:] = jnp.zeros_like(done_ref)
        for i in range(n_rb):
            rowdone_ref[i] = 0
        ndone_ref[0] = 0

    tri = _tri(g)

    def sub_chunk(sub, _):
        c_glob = c * cps + sub
        blk = gauss_ref[pl.ds(sub * g, g), :]
        base = c_glob * g
        word = c_glob // 32
        bit = c_glob % 32

        def row_block(rb, _):
            active = ((bits_ref[s * n_rb + rb, word] >> bit) & 1) == 1

            @pl.when(active & (rowdone_ref[rb] == 0))
            def _():
                px, py = _pixel_coords(rb, n_pix, width, strip_y0)
                _, _, _, alpha = _falloff(blk, px, py)
                hit = alpha > 0.0
                l = jnp.where(hit, jnp.log1p(-alpha), 0.0)
                cum = _cumsum_g(tri, l)
                logt_row = logt_ref[pl.ds(rb, 1), :]  # [1, P]
                logt_post = logt_row + cum
                # logt_post is non-increasing in j, so the latched
                # termination (oracle done_seq: fired at-or-before j) is
                # simply logt_post_j < LOG_TERM, and the carried logT never
                # crosses it (the firing Gaussian is excluded) — one scan,
                # no cummax.
                done_row = done_ref[pl.ds(rb, 1), :]
                contribute = hit & (done_row < 0.5) & (logt_post >= _LOG_TERM)
                w = jnp.where(contribute, alpha * jnp.exp(logt_post - l), 0.0)
                # per-channel broadcast-multiply + sublane-reduce
                for ch in range(4):
                    ch_contrib = jnp.sum(
                        w * blk[:, 6 + ch : 7 + ch], 0, keepdims=True
                    )  # [1, P]
                    acc_ref[0, ch, pl.ds(rb, 1), :] = (
                        acc_ref[0, ch, pl.ds(rb, 1), :] + ch_contrib
                    )
                # logT after the chunk = min over contributors (monotone).
                logt_ref[pl.ds(rb, 1), :] = jnp.min(
                    jnp.where(contribute, logt_post, logt_row), 0,
                    keepdims=True
                )
                gidx = base + jax.lax.broadcasted_iota(
                    jnp.int32, alpha.shape, 0)
                lc_row = lc_ref[0, pl.ds(rb, 1), :]
                lc_ref[0, pl.ds(rb, 1), :] = jnp.maximum(
                    lc_row,
                    jnp.max(jnp.where(contribute, gidx, -1), 0, keepdims=True)
                )
                fired = (hit & (logt_post < _LOG_TERM)).astype(jnp.float32)
                new_done = jnp.maximum(done_row, jnp.max(fired, 0, keepdims=True))
                done_ref[pl.ds(rb, 1), :] = new_done
                rd = jnp.min(new_done).astype(jnp.int32)
                rowdone_ref[rb] = rd
                ndone_ref[0] = ndone_ref[0] + rd  # rd=1 only on the 0->1
                # transition: once set, the (rowdone == 0) guard above keeps
                # this branch from ever running again for this row block.

            return 0

        @pl.when(ndone_ref[0] < n_rb)
        def _sub_work():
            jax.lax.fori_loop(0, n_rb, row_block, 0)

        return 0

    # Termination-dominated scenes saturate every row block within a few
    # front chunks; the remaining ~O(n_steps) grid steps must cost one
    # SMEM compare, not an n_rb predicate loop.
    @pl.when(ndone_ref[0] < n_rb)
    def _work():
        jax.lax.fori_loop(0, cps, sub_chunk, 0)

    @pl.when(c == n_steps - 1)
    def _final():
        tfin_ref[0] = jnp.exp(logt_ref[:])


# ---------------------------------------------------------------------------
# Backward kernel (chunks walked back-to-front)
# ---------------------------------------------------------------------------


def _bwd_kernel(
    bits_ref,  # SMEM [n_rb, n_words]
    gauss_ref,  # VMEM [G, 16] — chunk n_chunks-1-c (reversed index map)
    g4_ref,  # VMEM [4, n_rb, P] cotangents for (rgb_pre, depth)
    gtu_ref,  # VMEM [n_rb, P] g_T * T_final
    tfin_ref,  # VMEM [n_rb, P]
    lc_ref,  # VMEM [n_rb, P] int32
    dgauss_ref,  # out [G, 16] — chunk n_chunks-1-c
    ss_ref,  # scratch [n_rb, P]: g4 . (suffix weighted color)
    logtr_ref,  # scratch [n_rb, P]: log T after current chunk
    maxlc_ref,  # scratch SMEM [n_rb] int32: per-row-block max contributor
    gmax_ref,  # scratch SMEM [1] int32: global max contributor
    *,
    y0: int = 0,  # static row offset of this strip (packed-input path)
):
    c = pl.program_id(0)
    n_steps = pl.num_programs(0)
    n_rb, n_pix = ss_ref.shape
    cps = gauss_ref.shape[0] // G_CHUNK
    g = G_CHUNK
    width = n_pix // BLOCK_ROWS
    b = n_steps - 1 - c  # super-chunk (block) being processed

    @pl.when(c == 0)
    def _init():
        ss_ref[:] = jnp.zeros_like(ss_ref)
        logtr_ref[:] = jnp.log(jnp.maximum(tfin_ref[:], 1e-30))
        # One pass over lc: the per-(chunk, rb) contributor test must be an
        # SMEM compare, not a VMEM row reduce — back-to-front, nearly all
        # suffix chunks are past every row block's last contributor.
        def mk(rb, gm):
            m = jnp.max(lc_ref[pl.ds(rb, 1), :])
            maxlc_ref[rb] = m
            return jnp.maximum(gm, m)

        gmax_ref[0] = jax.lax.fori_loop(0, n_rb, mk, jnp.int32(-1))

    tri = _tri(g)
    dgauss_ref[:] = jnp.zeros_like(dgauss_ref)

    def sub_chunk(sub, _):
        k = b * cps + (cps - 1 - sub)  # global chunk, walked back-to-front
        blk = gauss_ref[pl.ds((cps - 1 - sub) * g, g), :]
        base = k * g
        word = k // 32
        bit = k % 32

        def row_block(rb, _):
            active = ((bits_ref[rb, word] >> bit) & 1) == 1

            @pl.when(active & (maxlc_ref[rb] >= base))
            def _():
                lc_row = lc_ref[pl.ds(rb, 1), :]
                px, py = _pixel_coords(rb, n_pix, width, y0)
                dx, dy, a_un, alpha = _falloff(blk, px, py)
                gidx = base + jax.lax.broadcasted_iota(
                    jnp.int32, alpha.shape, 0)
                contribute = (alpha > 0.0) & (gidx <= lc_row)
                om = jnp.where(contribute, 1.0 - alpha, 1.0)
                l = jnp.where(contribute, jnp.log1p(-alpha), 0.0)
                cum = _cumsum_g(tri, l)
                total_l = cum[g - 1 : g, :]
                csuf = total_l - cum + l  # sum_{k>=j} l_k
                logt_end = logtr_ref[pl.ds(rb, 1), :]
                t_at = jnp.exp(logt_end - csuf)  # T incident on Gaussian j
                w = jnp.where(contribute, alpha * t_at, 0.0)

                # b1[j, p] = g4_p . c4_j as 4 broadcasted FMAs
                b1 = jnp.zeros_like(alpha)
                for ch in range(4):
                    b1 = b1 + blk[:, 6 + ch : 7 + ch] * g4_ref[
                        ch, pl.ds(rb, 1), :
                    ]
                e = w * b1
                ecum = _cumsum_g(tri, e)
                etot = ecum[g - 1 : g, :]
                esuf = etot - ecum  # sum_{k>j} e_k (exclusive)

                ss_row = ss_ref[pl.ds(rb, 1), :]
                gtu_row = gtu_ref[pl.ds(rb, 1), :]
                dalpha = jnp.where(
                    contribute,
                    b1 * t_at - (ss_row + gtu_row + esuf) / om,
                    0.0,
                )
                dpow = dalpha * jnp.where(a_un < ALPHA_MAX, a_un, 0.0)
                ca, cb, cc = blk[:, 2:3], blk[:, 3:4], blk[:, 4:5]
                dmx = jnp.sum(dpow * (ca * dx + cb * dy), 1, keepdims=True)
                dmy = jnp.sum(dpow * (cc * dy + cb * dx), 1, keepdims=True)
                dca = jnp.sum(dpow * (-0.5 * dx * dx), 1, keepdims=True)
                dcb = jnp.sum(dpow * (-dx * dy), 1, keepdims=True)
                dcc = jnp.sum(dpow * (-0.5 * dy * dy), 1, keepdims=True)
                dlo = jnp.sum(dpow, 1, keepdims=True)
                dc4 = [
                    jnp.sum(w * g4_ref[ch, pl.ds(rb, 1), :], 1, keepdims=True)
                    for ch in range(4)
                ]
                delta = jnp.concatenate(
                    [dmx, dmy, dca, dcb, dcc, dlo, *dc4,
                     jnp.zeros((g, 6), jnp.float32)],
                    axis=1,
                )  # [G, 16]
                sl = pl.ds((cps - 1 - sub) * g, g)
                dgauss_ref[sl, :] = dgauss_ref[sl, :] + delta
                ss_ref[pl.ds(rb, 1), :] = ss_row + etot
                logtr_ref[pl.ds(rb, 1), :] = logt_end - total_l

            return 0

        @pl.when(gmax_ref[0] >= base)
        def _sub_work():
            jax.lax.fori_loop(0, n_rb, row_block, 0)

        return 0

    @pl.when(gmax_ref[0] >= b * cps * g)
    def _work():
        jax.lax.fori_loop(0, cps, sub_chunk, 0)


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------


def _g_step() -> int:
    return G_CHUNK * CHUNKS_PER_STEP


def _pack_gaussians(mean2d, conic, log_opacity, colors, depth, valid, y0):
    """[N_pad, 16] packed + padded Gaussian array (columns per _falloff)."""
    n = mean2d.shape[0]
    n_pad = _round_up(max(n, _g_step()), _g_step())
    lo = jnp.where(valid, log_opacity, -jnp.inf)
    mean2d = mean2d - jnp.array([0.0, float(y0)], jnp.float32)
    packed = jnp.concatenate(
        [mean2d, conic, lo[:, None], colors, depth[:, None],
         jnp.zeros((n, 6), jnp.float32)],
        axis=1,
    )
    return jnp.pad(packed, ((0, n_pad - n), (0, 0))).at[n:, 5].set(-jnp.inf)


def _row_block_bitmap(mean2d, conic, log_opacity, valid, y0, n_rows, n_chunks):
    """[n_rb, n_words] int32: bit c set iff chunk c can touch the row block.

    Per Gaussian the y-extent is the alpha-cutoff radius along the 2D
    covariance's major axis: alpha >= 1/255 requires
    0.5 d^T Conic d <= log_op - log(1/255), so |d| <= sqrt(2 m lam_max) with
    cov2d = inv(conic). Mirrors the reference's 3-sigma tile binning
    (radius from the max eigenvalue) but tied to the exact cutoff used in
    compositing, so no contributing Gaussian is ever skipped.
    """
    ca, cb, cc = conic[:, 0], conic[:, 1], conic[:, 2]
    det = ca * cc - cb * cb
    ok = valid & (det > 0.0) & (ca > 0.0)
    tr_cov = jnp.where(ok, (ca + cc) / jnp.maximum(det, 1e-30), 0.0)
    det_cov = jnp.where(ok, 1.0 / jnp.maximum(det, 1e-30), 0.0)
    mid = 0.5 * tr_cov
    lam_max = mid + jnp.sqrt(jnp.maximum(mid * mid - det_cov, 0.0))
    m = jnp.maximum(log_opacity - _LOG_ALPHA_EPS, 0.0)
    r = jnp.sqrt(2.0 * m * lam_max) * 1.001 + 1.0
    r = jnp.where(ok & (m > 0.0), r, -1.0)  # r < 0 => never contributes

    y = mean2d[:, 1] - float(y0)
    n_rb = n_rows // BLOCK_ROWS
    rb_lo = jnp.clip(jnp.floor((y - r) / BLOCK_ROWS).astype(jnp.int32), 0, n_rb)
    rb_hi = jnp.clip(jnp.floor((y + r) / BLOCK_ROWS).astype(jnp.int32), -1, n_rb - 1)
    # Per-chunk interval bound: chunk c covers [min rb_lo, max rb_hi] over
    # its gaussians. A strict superset of the exact per-gaussian union, so
    # never skips a contributor; computed with two [n_chunks, G] reductions
    # instead of a 2N-update scatter (measured 2.7 ms of device time per
    # forward — scatter is serialized on TPU). Depth-adjacent gaussians are
    # spatially uncorrelated in the worst case (interval ~ whole image), but
    # there the exact bitmap admitted ~everything too; skipping is then
    # carried by the termination latch, not the bitmap.
    n = mean2d.shape[0]
    n_pad = n_chunks * G_CHUNK
    alive = rb_hi >= rb_lo
    rb_lo = jnp.pad(jnp.where(alive, rb_lo, n_rb), (0, n_pad - n),
                    constant_values=n_rb).reshape(n_chunks, G_CHUNK)
    rb_hi = jnp.pad(jnp.where(alive, rb_hi, -1), (0, n_pad - n),
                    constant_values=-1).reshape(n_chunks, G_CHUNK)
    c_lo = jnp.min(rb_lo, axis=1)[:, None]  # [n_chunks, 1]
    c_hi = jnp.max(rb_hi, axis=1)[:, None]
    rbs = jnp.arange(n_rb)[None, :]
    cover = (rbs >= c_lo) & (rbs <= c_hi)  # [n_chunks, n_rb]
    n_words = _round_up(n_chunks, 32) // 32
    pad_c = n_words * 32 - n_chunks
    cover = jnp.pad(cover, ((0, pad_c), (0, 0)))  # [n_words*32, n_rb]
    cover = cover.reshape(n_words, 32, n_rb).astype(jnp.int32)
    shifts = (1 << jnp.arange(32, dtype=jnp.int32))[None, :, None]
    bits = jnp.sum(cover * shifts, axis=1)  # [n_words, n_rb]
    return bits.T.astype(jnp.int32)  # [n_rb, n_words]


def _strip_shapes(n, n_rows, width):
    n_pad = _round_up(max(n, _g_step()), _g_step())
    n_chunks = n_pad // G_CHUNK
    n_rb = n_rows // BLOCK_ROWS
    n_pix = BLOCK_ROWS * width
    return n_pad, n_chunks, n_rb, n_pix


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _composite_strip(
    mean2d, conic, log_opacity, colors, depth, valid,
    y0: int, n_rows: int, width: int, interpret: bool,
):
    out, _ = _composite_strip_fwd(
        mean2d, conic, log_opacity, colors, depth, valid,
        y0, n_rows, width, interpret,
    )
    return out


def _multi_fwd_call(packed, bits, kernel_y0, n_strips, strip_rows, width,
                    interpret):
    """Forward pallas_call on a packed+padded [N_pad, 16] chunk array over
    a (n_strips, n_steps) grid: the outer strip axis walks row strips of
    `strip_rows` (each strip's state blocks stay VMEM-resident for its
    whole inner chunk walk), so ONE dispatch composites any image height
    with VMEM bounded by the strip size. bits covers all strips'
    row blocks: [n_strips * strip_rows/BLOCK_ROWS, n_words].

    kernel_y0 is the static row offset applied to pixel y coordinates
    inside the kernel (0 when mean2d was pre-shifted by the caller).
    Returns (acc [S,4,n_rb,P], tfin [S,n_rb,P], lc [S,n_rb,P])."""
    n_pad = packed.shape[0]
    n_steps = n_pad // _g_step()
    n_rb = strip_rows // BLOCK_ROWS
    n_pix = BLOCK_ROWS * width

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_strips, n_steps),
        in_specs=[
            pl.BlockSpec((_g_step(), 16), lambda s, c, bits: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 4, n_rb, n_pix),
                         lambda s, c, bits: (s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_rb, n_pix), lambda s, c, bits: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_rb, n_pix), lambda s, c, bits: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((n_rb, n_pix), jnp.float32),
            pltpu.VMEM((n_rb, n_pix), jnp.float32),
            pltpu.SMEM((n_rb,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, y0=kernel_y0),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_strips, 4, n_rb, n_pix), jnp.float32),
            jax.ShapeDtypeStruct((n_strips, n_rb, n_pix), jnp.float32),
            jax.ShapeDtypeStruct((n_strips, n_rb, n_pix), jnp.int32),
        ),
        interpret=interpret,
    )(bits, packed)


def _strip_fwd_call(packed, bits, kernel_y0, n_rows, width, interpret):
    """Single-strip forward (grid (1, n_steps)); returns 3-D outputs."""
    acc, tfin, lc = _multi_fwd_call(packed, bits, kernel_y0, 1, n_rows,
                                    width, interpret)
    return acc[0], tfin[0], lc[0]


def _composite_strip_fwd(
    mean2d, conic, log_opacity, colors, depth, valid,
    y0, n_rows, width, interpret,
):
    n = mean2d.shape[0]
    n_pad, n_chunks, n_rb, n_pix = _strip_shapes(n, n_rows, width)
    packed = _pack_gaussians(mean2d, conic, log_opacity, colors, depth, valid, y0)
    bits = _row_block_bitmap(mean2d, conic, log_opacity, valid, y0, n_rows, n_chunks)
    acc, tfin, lc = _strip_fwd_call(packed, bits, 0, n_rows, width, interpret)
    residuals = (packed, bits, tfin, lc, n)
    return (acc, tfin, lc), residuals


def _strip_bwd_call(packed, bits, g_acc, gtu, tfin, lc,
                    kernel_y0, n_rows, width, interpret):
    """Shared backward pallas_call; returns dgauss [N_pad, 16]."""
    n_pad = packed.shape[0]
    n_steps = n_pad // _g_step()
    n_rb = n_rows // BLOCK_ROWS
    n_pix = BLOCK_ROWS * width
    rev = lambda c, bits: (n_steps - 1 - c, 0)  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((_g_step(), 16), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n_rb, n_pix), lambda c, bits: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_rb, n_pix), lambda c, bits: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_rb, n_pix), lambda c, bits: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_rb, n_pix), lambda c, bits: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_g_step(), 16), rev, memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_rb, n_pix), jnp.float32),
            pltpu.VMEM((n_rb, n_pix), jnp.float32),
            pltpu.SMEM((n_rb,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, y0=kernel_y0),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, 16), jnp.float32),
        interpret=interpret,
    )(bits, packed, g_acc, gtu, tfin, lc)


def _composite_strip_bwd(y0, n_rows, width, interpret, residuals, cots):
    packed, bits, tfin, lc, n = residuals
    g_acc, g_tfin, _ = cots
    if g_acc is None:
        g_acc = jnp.zeros((4,) + tfin.shape, jnp.float32)
    if g_tfin is None:
        g_tfin = jnp.zeros_like(tfin)
    gtu = g_tfin * tfin

    dgauss = _strip_bwd_call(packed, bits, g_acc, gtu, tfin, lc,
                             0, n_rows, width, interpret)
    dgauss = dgauss[:n]
    return (
        dgauss[:, 0:2],  # d mean2d
        dgauss[:, 2:5],  # d conic
        dgauss[:, 5],  # d log_opacity
        dgauss[:, 6:9],  # d colors
        dgauss[:, 9],  # d depth
        None,  # valid (bool)
    )


_composite_strip.defvjp(_composite_strip_fwd, _composite_strip_bwd)


# ---------------------------------------------------------------------------
# Packed-input path: the geometry front-end builds the kernel's [N, 16] chunk
# array directly out of one variadic lax.sort (driver.prepare_packed_splats),
# so the per-strip re-pack and the six post-argsort gathers disappear
# (measured ~2.3 ms/fwd on v5e at 100k Gaussians). The custom_vjp boundary is
# the packed array itself: backward returns the [N_pad, 16] gradient that the
# front-end transpose (sort permutation scatter) consumes.
# ---------------------------------------------------------------------------




# Full-image path: ONE forward dispatch over a (n_strips, n_steps) grid
# (strip-blocked output state — see _multi_fwd_call). Backward walks the
# strips as separate dispatches (per-chunk gradient blocks are revisited
# across strips, which the forward-style pipeline cannot accumulate), each
# reusing the forward's full-image bitmap rows.


# VMEM budget for one strip's resident state (16 MB scoped limit; leave
# headroom for the double-buffered gauss blocks + compiler temporaries).
_STRIP_VMEM_BUDGET = 12 * 1024 * 1024
# XLA stages the whole packed splat array in VMEM when it fits and is
# re-read by many strips (measured: 200k splats at 1080p overflow the
# scoped limit by exactly the packed array's 12.8 MB at every strip
# size, while 589k splats — too big to stage — compile fine); packed
# arrays under this threshold are charged against the strip budget.
_PACKED_STAGE_LIMIT = 14 * 1024 * 1024


def _image_strip_layout(height: int, width: int, n_packed: int = 0):
    """(w_pad, n_strips, strip_rows): the fewest equal-size strips whose
    per-strip VMEM state fits the budget (Mosaic double-buffers the
    strip-indexed out blocks — acc x4, tfin, lc — even though they are
    revisited across the inner chunk axis; logt/done scratch singly).
    Equal sizes keep the grid block shape uniform; e.g. 384 rows at
    width 512 -> 2 x 192. `n_packed`: splat-array rows, for the
    VMEM-staging charge (see _PACKED_STAGE_LIMIT)."""
    w_pad = _round_up(width, 128)
    h_pad = _round_up(height, BLOCK_ROWS)
    bytes_per_row = (2 * 6 + 2) * 4 * w_pad

    def layout(budget):
        cap = (budget // bytes_per_row) // BLOCK_ROWS * BLOCK_ROWS
        cap = max(BLOCK_ROWS, min(STRIP_ROWS, cap))
        n_strips = max(1, -(-h_pad // cap))
        strip_rows = _round_up(-(-h_pad // n_strips), BLOCK_ROWS)
        return n_strips, strip_rows

    n_strips, strip_rows = layout(_STRIP_VMEM_BUDGET)
    packed_bytes = n_packed * 16 * 4
    if n_strips >= 4 and 0 < packed_bytes <= _PACKED_STAGE_LIMIT:
        # the staging kicks in on high-reuse operands (many strips re-
        # reading the splat array); 2-strip training shapes measured clean
        n_strips, strip_rows = layout(
            max(1024 * 1024, _STRIP_VMEM_BUDGET - packed_bytes))
    return w_pad, n_strips, strip_rows


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _composite_multi(packed, n_strips: int, strip_rows: int, width: int,
                     interpret: bool):
    out, _ = _composite_multi_fwd(packed, n_strips, strip_rows, width,
                                  interpret)
    return out


def _composite_multi_fwd(packed, n_strips, strip_rows, width, interpret):
    n_pad = packed.shape[0]
    n_chunks = n_pad // G_CHUNK
    valid = packed[:, 5] > -1e30
    bits = _row_block_bitmap(packed[:, 0:2], packed[:, 2:5], packed[:, 5],
                             valid, 0, n_strips * strip_rows, n_chunks)
    acc, tfin, lc = _multi_fwd_call(packed, bits, 0, n_strips, strip_rows,
                                    width, interpret)
    return (acc, tfin, lc), (packed, bits, tfin, lc)


def _composite_multi_bwd(n_strips, strip_rows, width, interpret, residuals,
                         cots):
    packed, bits, tfin, lc = residuals
    g_acc, g_tfin, _ = cots
    if g_acc is None:
        g_acc = jnp.zeros(tfin.shape[:1] + (4,) + tfin.shape[1:],
                          jnp.float32)
    if g_tfin is None:
        g_tfin = jnp.zeros_like(tfin)
    n_rb = strip_rows // BLOCK_ROWS
    dgauss = jnp.zeros((packed.shape[0], 16), jnp.float32)
    for s in range(n_strips):
        gtu_s = g_tfin[s] * tfin[s]
        dgauss = dgauss + _strip_bwd_call(
            packed, bits[s * n_rb:(s + 1) * n_rb], g_acc[s], gtu_s,
            tfin[s], lc[s], s * strip_rows, strip_rows, width, interpret)
    return (dgauss,)


_composite_multi.defvjp(_composite_multi_fwd, _composite_multi_bwd)


def pack_splats(mean2d, conic, log_opacity, colors, depth, valid):
    """Column-stack pre-sorted splats into the kernel's packed layout.

    Prefer building the packed array straight out of the depth sort
    (driver.prepare_packed_splats); this helper exists for callers that
    already hold separate sorted arrays."""
    lo = jnp.where(valid, log_opacity, -jnp.inf)
    return jnp.concatenate(
        [mean2d, conic, lo[:, None], colors, depth[:, None]], axis=1)


def composite_tiles_packed(
    packed, height: int, width: int, bg=None, interpret: bool | None = None,
) -> CompositeOut:
    """Composite a packed, depth-sorted [N, >=10] splat array.

    Column layout per `_falloff`: mx, my, conic_a, conic_b, conic_c,
    log_opacity (-inf = invalid), r, g, b, depth. Rows must be sorted
    front-to-back. Differentiable w.r.t. `packed` and `bg`.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n, k = packed.shape
    n_pad = _round_up(max(n, _g_step()), _g_step())
    packed = jnp.pad(packed, ((0, n_pad - n), (0, 16 - k)))
    if n_pad > n:
        packed = packed.at[n:, 5].set(-jnp.inf)
    w_pad, n_strips, strip_rows = _image_strip_layout(height, width, n_pad)

    acc, tfin, _ = _composite_multi(packed, n_strips, strip_rows, w_pad,
                                    interpret)
    acc = jnp.moveaxis(acc, 1, 0).reshape(
        4, n_strips * strip_rows, w_pad)[:, :height, :width]
    tfin = tfin.reshape(n_strips * strip_rows, w_pad)[:height, :width]

    rgb = jnp.moveaxis(acc[:3], 0, -1)  # [H, W, 3]
    if bg is not None:
        rgb = rgb + tfin[:, :, None] * bg[None, None, :]
    return CompositeOut(rgb=rgb, alpha=1.0 - tfin, depth=acc[3])


def composite_tiles(
    mean2d, conic, log_opacity, colors, depth, valid,
    height: int, width: int, bg=None, interpret: bool | None = None,
) -> CompositeOut:
    """Drop-in Pallas replacement for rasterize.composite (same semantics).

    All per-Gaussian arrays must be depth-sorted front-to-back (use
    rasterize.sort_by_depth). Differentiable w.r.t. all float inputs incl. bg.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    w_pad = _round_up(width, 128)
    h_pad = _round_up(height, BLOCK_ROWS)

    accs, tfins = [], []
    for y0 in range(0, h_pad, STRIP_ROWS):
        rows = min(STRIP_ROWS, h_pad - y0)
        acc, tfin, _ = _composite_strip(
            mean2d, conic, log_opacity, colors, depth, valid,
            y0, rows, w_pad, interpret,
        )
        n_rb = rows // BLOCK_ROWS
        accs.append(acc.reshape(4, n_rb * BLOCK_ROWS, w_pad))
        tfins.append(tfin.reshape(n_rb * BLOCK_ROWS, w_pad))
    acc = jnp.concatenate(accs, axis=1)[:, :height, :width]
    tfin = jnp.concatenate(tfins, axis=0)[:height, :width]

    rgb = jnp.moveaxis(acc[:3], 0, -1)  # [H, W, 3]
    if bg is not None:
        rgb = rgb + tfin[:, :, None] * bg[None, None, :]
    return CompositeOut(rgb=rgb, alpha=1.0 - tfin, depth=acc[3])
