"""Device mesh + sharding rules for multi-chip training and rendering.

The reference has no device-parallel capability at all in its pipeline (its
only parallelism is a shell script launching one scene per GPU —
scripts/run_eval.sh:42-50; SURVEY.md §2.2). This module is the new,
first-class TPU capability: scale ONE scene across a chip mesh.

Sharding layout (BASELINE.json north star):
- Gaussians: replicated on every chip (a sparse-view scene is 10^4..10^6
  Gaussians — a few hundred MB at most, and every tile may touch any
  Gaussian);
- pixels: the image is split into contiguous row-blocks, one per chip; each
  chip composites its rows against the full depth-sortedAussian list;
- the rendered row-blocks are `all_gather`ed (tiled) into a replicated image
  so the SSIM window never crosses a shard boundary;
- gradients: the transpose of `shard_map` + `all_gather` automatically
  reduce-scatters the pixel gradients and `psum`s the replicated Gaussian /
  pose gradients over the ICI mesh — no hand-written collectives in the
  training step.

The same code runs on a real TPU pod slice and on the CPU test mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from instantsplat_tpu.models.camera import Camera
from instantsplat_tpu.models.gaussians import GaussianModel
from instantsplat_tpu.opt.gaussian_opt import GaussianOptimizer
from instantsplat_tpu.ops import rasterize
from instantsplat_tpu.ops.losses import photometric_loss, psnr
from instantsplat_tpu.render.driver import (
    prepare_packed_splats,
    prepare_sorted_splats,
)

AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis_name: str = AXIS) -> Mesh:
    """1-D mesh over the first n_devices (default: all local devices)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def _padded_rows(height: int, ndev: int) -> int:
    return ((height + ndev - 1) // ndev) * ndev // ndev


def sharded_render(
    gaussians: GaussianModel,
    camera: Camera,
    mesh: Mesh,
    pose: Optional[jax.Array] = None,
    bg: Optional[jax.Array] = None,
    active_sh_degree: Optional[int] = None,
    chunk: int = 256,
    scale_modifier: float = 1.0,
    backend: str = "oracle",
):
    """Render one view with pixel rows sharded over the mesh.

    Returns (rgb [H,W,3], alpha [H,W], depth [H,W]) replicated on all chips.
    Differentiable w.r.t. gaussians and pose (gradients psum'd over the
    mesh). `backend` selects each chip's local compositor: 'oracle' (jnp
    scan; runs anywhere) or 'pallas'/'pallas-binned' (TPU kernels — each
    chip rasterizes its own row block with the same kernel the single-chip
    driver uses, Gaussians y-shifted into block-local coordinates).
    """
    if pose is None:
        pose = camera.pose
    if bg is None:
        bg = jnp.zeros(3, jnp.float32)
    if active_sh_degree is None:
        active_sh_degree = gaussians.max_sh_degree
    H, W = camera.height, camera.width
    ndev = mesh.shape[AXIS]
    rows_per = _padded_rows(H, ndev)

    # Backward structure (north-star psum placement): the geometry front-end
    # runs OUTSIDE the shard_map on replicated inputs, so the shard_map
    # transpose psums the compact per-splat cotangent ([N, 16] packed /
    # six splat arrays) right after each chip's local compositing backward —
    # the smallest tensor the reduction can ride on — and the front-end
    # transpose (sort permutation + projection/SH backward) then runs on
    # already-summed values. The image cotangent enters through the
    # all_gather transpose as a per-chip row slice (no replicated-pixel
    # traffic).
    if backend == "pallas":
        from instantsplat_tpu.ops import rasterize_pallas

        packed, _ = prepare_packed_splats(
            gaussians, pose, camera.fx, camera.fy, camera.cx, camera.cy,
            jnp.float32(scale_modifier), active_sh_degree, H, W,
        )

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
        def _rows_packed(pk, bg_):
            i = jax.lax.axis_index(AXIS)
            y0 = (i * rows_per).astype(jnp.float32)
            # shift splat y-centers into block-local row coordinates
            shift = jnp.zeros((pk.shape[1],), jnp.float32).at[1].set(1.0) * y0
            out = rasterize_pallas.composite_tiles_packed(
                pk - shift[None, :], height=rows_per, width=W, bg=bg_,
            )
            rgb = jax.lax.all_gather(out.rgb, AXIS, axis=0, tiled=True)
            alpha = jax.lax.all_gather(out.alpha, AXIS, axis=0, tiled=True)
            depth = jax.lax.all_gather(out.depth, AXIS, axis=0, tiled=True)
            return rgb, alpha, depth

        rgb, alpha, depth = _rows_packed(packed, bg)
        return rgb[:H], alpha[:H], depth[:H]

    sorted_splats, _ = prepare_sorted_splats(
        gaussians, pose, camera.fx, camera.fy, camera.cx, camera.cy,
        jnp.float32(scale_modifier), active_sh_degree, H, W,
    )

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        # the compositor's scan carries are initialized device-invariant but
        # become device-varying (each chip renders different rows); skip the
        # varying-manual-axes check rather than thread pvary through a
        # backend-agnostic compositor.
        check_vma=False,
    )
    def _rows(m2, cn, lo, col, dep, val, bg_):
        i = jax.lax.axis_index(AXIS)
        y0 = (i * rows_per).astype(jnp.float32)
        if backend == "oracle":
            out = rasterize.composite(
                m2, cn, lo, col, dep, val,
                height=rows_per, width=W, bg=bg_, chunk=chunk, y_offset=y0,
            )
        else:
            from instantsplat_tpu.ops import rasterize_pallas_binned
            from instantsplat_tpu.render.driver import _parse_binned_caps

            cf, dl = _parse_binned_caps(backend)
            m2_local = m2 - jnp.stack(
                [jnp.zeros_like(y0), y0])[None, :]
            out = rasterize_pallas_binned.composite_tiles_binned(
                m2_local, cn, lo, col, dep, val,
                height=rows_per, width=W, bg=bg_,
                cap_factor=cf, d_levels=dl)
        rgb = jax.lax.all_gather(out.rgb, AXIS, axis=0, tiled=True)
        alpha = jax.lax.all_gather(out.alpha, AXIS, axis=0, tiled=True)
        depth = jax.lax.all_gather(out.depth, AXIS, axis=0, tiled=True)
        return rgb, alpha, depth

    rgb, alpha, depth = _rows(*sorted_splats, bg)
    return rgb[:H], alpha[:H], depth[:H]


def _merge_depth_slices(out, bg_, axis: str, ndev: int):
    """Cross-slice over-operator merge (inside shard_map): each chip holds
    the premultiplied composite of its contiguous depth slice; gather the
    [H, W] slice transmittances, weight each chip's colors/depth by the
    product of all EARLIER slices' transmittance, and psum.
    (C_a, T_a) o (C_b, T_b) = (C_a + T_a*C_b, T_a*T_b)."""
    tfin = 1.0 - out.alpha
    i = jax.lax.axis_index(axis)
    t_all = jax.lax.all_gather(tfin, axis)  # [ndev, H, W]
    before = (jnp.arange(ndev) < i)[:, None, None]
    prefix = jnp.prod(jnp.where(before, t_all, 1.0), axis=0)
    total = jnp.prod(t_all, axis=0)
    rgb = jax.lax.psum(prefix[..., None] * out.rgb, axis)
    depth = jax.lax.psum(prefix * out.depth, axis)
    rgb = rgb + total[..., None] * bg_[None, None, :]
    return rgb, 1.0 - total, depth


def gaussian_sharded_render(
    gaussians: GaussianModel,
    camera: Camera,
    mesh: Mesh,
    pose: Optional[jax.Array] = None,
    bg: Optional[jax.Array] = None,
    active_sh_degree: Optional[int] = None,
    scale_modifier: float = 1.0,
):
    """Render one view with the GAUSSIANS depth-sliced over the mesh.

    The complementary scaling axis to `sharded_render`: pixel sharding
    gives every chip the full N-Gaussian compositing workload; here each
    chip composites a CONTIGUOUS DEPTH SLICE of the globally sorted splat
    list over the full image, and the per-chip partials merge with the
    associative over operator —
    (C_a, T_a) o (C_b, T_b) = (C_a + T_a*C_b, T_a*T_b) for depth-ordered
    segments a before b — as one all_gather of the [H, W] transmittance
    maps + a prefix-product-weighted psum of the premultiplied colors.
    Per-chip COMPOSITING work (the dominant cost: falloff/prefix-sum/
    gradient math over [G, pixels] blocks) scales 1/ndev in N. The
    geometry front-end (projection, SH, the global depth sort, the
    [N, 16] packed array) stays replicated — the sort is global by
    construction — so per-chip MEMORY still carries O(N) front-end
    state; this path scales compute, not the N memory ceiling.

    Semantics note: the single-device early-termination latch (fires when
    T would cross 1e-4 and drops the firing splat too — the CUDA
    `continue` semantics) cannot see across slices, so this path
    composites the splats the latch truncates, weighted by the true
    incident transmittance. The image difference is bounded by the
    incident T at the latch (≤ ~1e-2 when one ALPHA_MAX splat fires it,
    typically ≪ 1e-3) — the sliced result is the more-converged one.
    Differentiable w.r.t. gaussians and pose.

    Returns (rgb [H,W,3], alpha [H,W], depth [H,W]) replicated.
    """
    from instantsplat_tpu.ops import rasterize_pallas

    if pose is None:
        pose = camera.pose
    if bg is None:
        bg = jnp.zeros(3, jnp.float32)
    if active_sh_degree is None:
        active_sh_degree = gaussians.max_sh_degree
    H, W = camera.height, camera.width
    ndev = mesh.shape[AXIS]

    # global depth sort on replicated inputs; slices stay depth-contiguous
    packed, _ = prepare_packed_splats(
        gaussians, pose, camera.fx, camera.fy, camera.cx, camera.cy,
        jnp.float32(scale_modifier), active_sh_degree, H, W,
    )
    n = packed.shape[0]
    n_pad = ((n + ndev - 1) // ndev) * ndev
    if n_pad > n:  # pad at the back of the depth order with invalid rows
        packed = jnp.pad(packed, ((0, n_pad - n), (0, 0)))
        packed = packed.at[n:, 5].set(-jnp.inf)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(AXIS), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def _slices(pk, bg_):
        out = rasterize_pallas.composite_tiles_packed(
            pk, height=H, width=W, bg=None)
        return _merge_depth_slices(out, bg_, AXIS, ndev)

    return _slices(packed, bg)


def hybrid_sharded_render(
    gaussians: GaussianModel,
    camera: Camera,
    mesh: Mesh,
    pose: Optional[jax.Array] = None,
    bg: Optional[jax.Array] = None,
    active_sh_degree: Optional[int] = None,
    scale_modifier: float = 1.0,
    pix_axis: str = "pix",
    gauss_axis: str = "gauss",
):
    """Render with BOTH sharding axes on a 2-D mesh: pixel row-blocks over
    `pix_axis`, depth slices of the sorted splats over `gauss_axis`. Each
    chip composites (its slice) x (its rows); the over-operator merge runs
    along `gauss_axis` (all_gather of [rows_per, W] transmittances +
    prefix-weighted psum — put this axis LAST in make_mesh_nd so the
    heavier collective rides ICI-adjacent chips), then the merged row
    blocks all_gather along `pix_axis`. Per-chip compositing work scales
    1/(n_pix * n_gauss); same latch-tolerance semantics as
    `gaussian_sharded_render`.

    Returns (rgb [H,W,3], alpha [H,W], depth [H,W]) replicated.
    """
    from instantsplat_tpu.ops import rasterize_pallas

    if pose is None:
        pose = camera.pose
    if bg is None:
        bg = jnp.zeros(3, jnp.float32)
    if active_sh_degree is None:
        active_sh_degree = gaussians.max_sh_degree
    H, W = camera.height, camera.width
    n_pix = mesh.shape[pix_axis]
    n_gauss = mesh.shape[gauss_axis]
    rows_per = _padded_rows(H, n_pix)

    packed, _ = prepare_packed_splats(
        gaussians, pose, camera.fx, camera.fy, camera.cx, camera.cy,
        jnp.float32(scale_modifier), active_sh_degree, H, W,
    )
    n = packed.shape[0]
    n_pad = ((n + n_gauss - 1) // n_gauss) * n_gauss
    if n_pad > n:
        packed = jnp.pad(packed, ((0, n_pad - n), (0, 0)))
        packed = packed.at[n:, 5].set(-jnp.inf)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(gauss_axis), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def _tiles(pk, bg_):
        i = jax.lax.axis_index(pix_axis)
        y0 = (i * rows_per).astype(jnp.float32)
        shift = jnp.zeros((pk.shape[1],), jnp.float32).at[1].set(1.0) * y0
        out = rasterize_pallas.composite_tiles_packed(
            pk - shift[None, :], height=rows_per, width=W, bg=None)
        # depth-slice merge along the gauss axis, then row-block gather
        # along the pix axis
        rgb, alpha, depth = _merge_depth_slices(out, bg_, gauss_axis,
                                                n_gauss)
        rgb = jax.lax.all_gather(rgb, pix_axis, axis=0, tiled=True)
        alpha = jax.lax.all_gather(alpha, pix_axis, axis=0, tiled=True)
        depth = jax.lax.all_gather(depth, pix_axis, axis=0, tiled=True)
        return rgb, alpha, depth

    rgb, alpha, depth = _tiles(packed, bg)
    return rgb[:H], alpha[:H], depth[:H]


def make_sharded_train_step(
    optimizer: GaussianOptimizer,
    cameras: Camera,  # batched [V, ...] pytree
    bg: jax.Array,
    lambda_dssim: float,
    mesh: Mesh,
    chunk: int = 256,
    backend: str = "oracle",
    shard_axis: str = "pixels",
):
    """Sharded version of pipelines.trainer.make_train_step.

    One jitted program: render (sharded over chips) -> photometric loss
    -> backward (Gaussian/pose grads psum'd over ICI) -> grouped Adam update
    (replicated). `backend` selects each chip's local compositor, exactly as
    in the single-chip driver ('pallas' = the production packed kernel).
    `shard_axis`: 'pixels' (rows per chip, Gaussians replicated) or
    'gaussians' (depth slices per chip, full image each — the large-N
    regime; pallas-backed, see gaussian_sharded_render)."""
    assert shard_axis in ("pixels", "gaussians"), shard_axis

    @functools.partial(jax.jit, static_argnames=("active_sh",))
    def train_step(params, opt_state, view_idx, iteration, active_sh: int):
        cam = jax.tree.map(lambda x: x[view_idx], cameras)

        def loss_fn(p):
            pose = p.get_pose(view_idx)
            if shard_axis == "gaussians":
                rgb, _, _ = gaussian_sharded_render(
                    p, cam, mesh, pose=pose, bg=bg,
                    active_sh_degree=active_sh,
                )
            else:
                rgb, _, _ = sharded_render(
                    p, cam, mesh, pose=pose, bg=bg,
                    active_sh_degree=active_sh, chunk=chunk,
                    backend=backend,
                )
            loss, aux = photometric_loss(rgb, cam.image, lambda_dssim)
            aux["psnr"] = psnr(rgb, cam.image)
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        params, opt_state = optimizer.step(params, grads, opt_state, iteration)
        return params, opt_state, dict(loss=loss, **aux)

    return train_step
