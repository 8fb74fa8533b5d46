"""Pose-differentiable render driver.

Functional equivalent of the reference `gaussian_renderer/__init__.py:render`
(the InstantSplat variant that keeps the camera pose in the autodiff graph).
The reference achieves pose gradients by passing an identity view matrix to
the CUDA rasterizer and pre-transforming Gaussian means/rotations by the
learnable pose outside the kernel (gaussian_renderer/__init__.py:55-90). In
JAX none of that indirection is needed: the pose is simply an input to a pure
function and grad flows through the world->camera transform inside
`project_gaussians`.

Semantics parity notes:
- SH view directions are camera-frame (the reference evaluates SH with
  campos=origin after pre-transforming means — gaussian_renderer/__init__.py
  :59,83-90 — so directions are view-space); we reproduce that.
- color = max(SH + 0.5, 0) clamp as in the CUDA `computeColorFromSH`.
- background blend, alpha clamp 0.99, 1/255 cutoff, 1e-4 T termination: see
  ops/rasterize.py.
"""

from __future__ import annotations

import functools
import logging
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from instantsplat_tpu.models.camera import Camera
from instantsplat_tpu.models.gaussians import GaussianModel
from instantsplat_tpu.ops import (
    rasterize,
    rasterize_pallas,
    rasterize_pallas_binned,
    rasterize_pallas_tiled,
)


class RenderOut(NamedTuple):
    render: jax.Array  # [H, W, 3]
    alpha: jax.Array  # [H, W]
    depth: jax.Array  # [H, W]
    radii: jax.Array  # [N] screen-space 3-sigma radii (0 = culled)
    visibility: jax.Array  # [N] bool, radii > 0


def _sorted_columns(
    gaussians: GaussianModel,
    pose: jax.Array,
    fx, fy, cx, cy,
    scale_modifier,
    active_sh_degree: int,
    height: int,
    width: int,
):
    """Lane-major front-end + depth sort. Returns (s, cols): `s` the 10
    sorted [N] columns (key/depth, mx, my, ca, cb, cc, log_op, r, g, b)
    and `cols` the unsorted FrontendCols record (radius/valid reporting).

    The geometry math runs on [N] columns with N on the lane axis
    (ops/frontend.py — the structured [N, 3]/[N, 3, 3] forms forced XLA
    layouts that made the front-end ~60% of the train step), and ONE
    variadic sort carries every column through the comparator network
    with a one-sort backward (sort_payload). Validity folds into the key
    (finite sentinel -> the sorted key doubles as the depth column) and
    into log-opacity (-inf)."""
    from instantsplat_tpu.ops.frontend import compute_columns

    cols = compute_columns(
        gaussians, pose, fx, fy, cx, cy, scale_modifier, active_sh_degree,
        height, width,
    )
    key = jnp.where(cols.valid, cols.depth, _INVALID_DEPTH)
    lo_m = jnp.where(cols.valid, cols.log_op, -jnp.inf)
    s = sort_payload(key, cols.mx, cols.my, cols.ca, cols.cb, cols.cc,
                     lo_m, cols.r, cols.g, cols.b)
    return s, cols


def prepare_sorted_splats(
    gaussians: GaussianModel,
    pose: jax.Array,
    fx,
    fy,
    cx,
    cy,
    scale_modifier,
    active_sh_degree: int,
    height: int,
    width: int,
):
    """Shared geometry front-end: activate, transform by pose, SH-shade,
    project, depth-sort. Returns (mean2d, conic, log_opacity, colors, depth,
    valid) all sorted front-to-back, plus the per-Gaussian radius/valid
    record in original order. Used by the oracle/binned backends and the
    pixel-sharded path (instantsplat_tpu.parallel)."""
    s, cols = _sorted_columns(
        gaussians, pose, fx, fy, cx, cy, scale_modifier, active_sh_degree,
        height, width,
    )
    sorted_splats = (
        jnp.stack([s[1], s[2]], axis=1),
        jnp.stack([s[3], s[4], s[5]], axis=1),
        s[6],
        jnp.stack([s[7], s[8], s[9]], axis=1),
        s[0],
        s[0] < _INVALID_DEPTH,
    )
    return sorted_splats, cols


@jax.custom_vjp
def sort_payload(key, *cols):
    """Variadic depth sort with a one-sort backward.

    Sorts by `key` ascending and returns (sorted_key, *sorted_cols). The
    stock lax.sort VJP transposes each payload column as a SEPARATE
    scatter-add (one per column — serialized and bandwidth-poor on TPU;
    measured ~5.7 ms of an 18 ms train step); here the backward applies
    the inverse permutation to every cotangent column with ONE variadic
    lax.sort keyed on the forward's permutation. The sorted key is a
    first-class differentiable output (its cotangent rides the same
    inverse sort), so callers can reuse it as the depth column instead of
    paying for a duplicate payload. Sort cost scales with payload bytes
    (the comparator network moves every column through ~log^2 N stages) —
    keep the column count minimal.
    """
    s = jax.lax.sort((key,) + cols, num_keys=1, is_stable=False)
    return s


def _sort_payload_fwd(key, *cols):
    n = key.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    s = jax.lax.sort((key, iota) + cols, num_keys=1, is_stable=False)
    return (s[0],) + s[2:], s[1]  # residual: the permutation


def _sort_payload_bwd(perm, cts):
    # rows return to their original positions when sorted by perm ascending
    restored = jax.lax.sort((perm,) + tuple(cts), num_keys=1,
                            is_stable=False)
    return tuple(restored[1:])


sort_payload.defvjp(_sort_payload_fwd, _sort_payload_bwd)

# Finite "invalid" depth sentinel: sorts after every real depth, and a
# zero compositing weight times it stays zero (jnp.inf would make
# 0 * inf = NaN in the depth channel).
_INVALID_DEPTH = 1e30


def prepare_packed_splats(
    gaussians: GaussianModel,
    pose: jax.Array,
    fx,
    fy,
    cx,
    cy,
    scale_modifier,
    active_sh_degree: int,
    height: int,
    width: int,
):
    """Geometry front-end for the packed Pallas path.

    Same math as `prepare_sorted_splats` (the shared lane-major column
    front-end + one variadic sort), column-stacked straight into the
    kernel's packed [N, 10] layout (rasterize_pallas._falloff column
    order) — the stack is the only structured array the whole front-end
    materializes.
    """
    s, cols = _sorted_columns(
        gaussians, pose, fx, fy, cx, cy, scale_modifier, active_sh_degree,
        height, width,
    )
    # column 9 (depth) is the sorted key itself: invalid rows carry the
    # finite sentinel, which every compositing weight multiplies by zero
    packed = jnp.stack(
        [s[1], s[2], s[3], s[4], s[5], s[6], s[7], s[8], s[9], s[0]],
        axis=1,
    )
    return packed, cols


@functools.partial(
    jax.jit,
    static_argnames=("active_sh_degree", "height", "width", "chunk", "backend"),
)
def _render_impl(
    gaussians: GaussianModel,
    pose: jax.Array,
    fx,
    fy,
    cx,
    cy,
    bg: jax.Array,
    scale_modifier,
    active_sh_degree: int,
    height: int,
    width: int,
    chunk: int,
    backend: str,
) -> RenderOut:
    if backend == "pallas":
        # dense chunked kernel: bitmap skip + early termination — fastest
        # for joint-optimization workloads (opaque scenes saturate T fast).
        # The packed front-end feeds the kernel's [N, 16] chunk layout
        # straight out of one variadic lax.sort (no per-array gathers).
        packed, proj = prepare_packed_splats(
            gaussians, pose, fx, fy, cx, cy, scale_modifier,
            active_sh_degree, height, width,
        )
        out = rasterize_pallas.composite_tiles_packed(
            packed, height=height, width=width, bg=bg,
        )
        return RenderOut(
            render=out.rgb,
            alpha=out.alpha,
            depth=out.depth,
            radii=proj.radius,
            visibility=proj.valid,
        )

    sorted_splats, proj = prepare_sorted_splats(
        gaussians, pose, fx, fy, cx, cy, scale_modifier, active_sh_degree,
        height, width,
    )
    mean2d, conic, log_op, colors, depth, valid = sorted_splats

    if backend == "oracle":
        out = rasterize.composite(
            mean2d, conic, log_op, colors, depth, valid,
            height=height, width=width, bg=bg, chunk=chunk,
        )
    elif backend.startswith("pallas-tiled"):
        # 2-D (row-block x column-bucket) gather lists — the CUDA 16x16
        # tile analogue (rasterize_pallas_tiled). Wins on small-splat /
        # uniform-depth scenes where the 1-D binned kernel wastes ~99% of
        # each full-width falloff block. Optional capacity suffix
        # "pallas-tiled:CF:DY:DX" (sized by tile_requirements).
        cf, dy, dx = _parse_tiled_caps(backend)
        out = rasterize_pallas_tiled.composite_tiles_2d(
            mean2d, conic, log_op, colors, depth, valid,
            height=height, width=width, bg=bg, cap_factor=cf,
            dy_levels=dy, dx_levels=dx)
    elif backend.startswith("pallas-binned"):
        # per-row-block gather lists (CUDA-style tile binning): amortized
        # O(sum extents) compute — wins when termination/bitmap skipping is
        # weak (low-opacity scenes, very large N). Optional capacity
        # suffix "pallas-binned:CF:DL" (cap_factor, d_levels — sized by
        # rasterize_pallas_binned.bin_requirements for drop-free binning
        # on scenes that exceed the defaults).
        cf, dl = _parse_binned_caps(backend)
        out = rasterize_pallas_binned.composite_tiles_binned(
            mean2d, conic, log_op, colors, depth, valid,
            height=height, width=width, bg=bg, cap_factor=cf, d_levels=dl,
        )
    else:
        raise ValueError(f"unknown rasterizer backend: {backend}")

    return RenderOut(
        render=out.rgb,
        alpha=out.alpha,
        depth=out.depth,
        radii=proj.radius,
        visibility=proj.valid,
    )


_log = logging.getLogger(__name__)


def _parse_binned_caps(backend: str):
    """"pallas-binned[:CF:DL]" -> (cap_factor | None, d_levels | None)."""
    parts = backend.split(":")
    if len(parts) == 3:
        return int(parts[1]), int(parts[2])
    return None, None


def _parse_tiled_caps(backend: str):
    """"pallas-tiled[:CF:DY:DX]" -> (cap_factor, dy, dx) or Nones."""
    parts = backend.split(":")
    if len(parts) == 4:
        return int(parts[1]), int(parts[2]), int(parts[3])
    return None, None, None

# Binned-backend overflow guard. The kernels cannot warn inline (axon has no
# debug callbacks — CLAUDE.md), so the driver checks the bin-capacity flag
# host-side: once on the first binned call for a (N, H, W) signature and then
# every _BINNED_CHECK_EVERY calls (scene content drifts during training). On
# overflow the signature is demoted to the dense kernel, which never drops
# splats — matching the CUDA rasterizer's drop-free guarantee
# (diff-gaussian-rasterization allocates exact per-tile lists).
_BINNED_CHECK_EVERY = 100
_binned_call_count: dict = {}
_binned_demoted: set = set()


@functools.partial(
    jax.jit, static_argnames=("height", "width"))
def _binned_sizing_impl(gaussians, pose, fx, fy, cx, cy, scale_modifier,
                        height: int, width: int):
    """Device probe for binned-bin sizing: (cap_factor float, d_levels int)
    the CURRENT scene state needs, as one jitted program (eager jnp ops are
    poison on the axon tunnel — CLAUDE.md)."""
    from instantsplat_tpu.ops.rasterize_pallas_binned import (
        _bin_requirements_impl,
    )

    (mean2d, conic, log_op, _, _, valid), _ = prepare_sorted_splats(
        gaussians, pose, fx, fy, cx, cy, scale_modifier, 0, height, width,
    )
    return _bin_requirements_impl(mean2d, conic, log_op, valid,
                                  height, width)


def binned_view_requirements(gaussians, pose, camera,
                             scale_modifier: float = 1.0) -> tuple[int, int]:
    """Host-side (cap_factor, d_levels) this view needs for drop-free
    binning, with the standard drift margin applied
    (rasterize_pallas_binned.sizing_margin) — the sizing both
    pipelines.trainer's and render_pipeline's backend auto-selection use."""
    from instantsplat_tpu.ops.rasterize_pallas_binned import sizing_margin

    cf, dl = _binned_sizing_impl(
        gaussians, pose, camera.fx, camera.fy, camera.cx, camera.cy,
        jnp.float32(scale_modifier), camera.height, camera.width)
    return sizing_margin(float(cf), int(dl))


@functools.partial(
    jax.jit, static_argnames=("height", "width"))
def _tiled_sizing_impl(gaussians, pose, fx, fy, cx, cy, scale_modifier,
                       height: int, width: int):
    """Device probe for 2-D tile sizing: (cap_factor float, dy int,
    dx int) the CURRENT scene state needs, as one jitted program."""
    from instantsplat_tpu.ops.rasterize_pallas_tiled import (
        _tile_requirements_impl,
    )

    (mean2d, conic, log_op, _, _, valid), _ = prepare_sorted_splats(
        gaussians, pose, fx, fy, cx, cy, scale_modifier, 0, height, width,
    )
    return _tile_requirements_impl(mean2d, conic, log_op, valid,
                                   height, width)


def tiled_view_requirements(gaussians, pose, camera,
                            scale_modifier: float = 1.0,
                            ) -> tuple[int, int, int]:
    """Host-side (cap_factor, dy_levels, dx_levels) this view needs for a
    drop-free 2-D tiled build, with the standard drift margin
    (rasterize_pallas_tiled.sizing_margin_2d)."""
    from instantsplat_tpu.ops.rasterize_pallas_tiled import sizing_margin_2d

    cf, dy, dx = _tiled_sizing_impl(
        gaussians, pose, camera.fx, camera.fy, camera.cx, camera.cy,
        jnp.float32(scale_modifier), camera.height, camera.width)
    return sizing_margin_2d(float(cf), int(dy), int(dx))


@functools.partial(
    jax.jit,
    static_argnames=("active_sh_degree", "height", "width", "cf", "dy",
                     "dx"))
def _tiled_overflow_impl(gaussians, pose, fx, fy, cx, cy, scale_modifier,
                         active_sh_degree: int, height: int, width: int,
                         cf=None, dy=None, dx=None):
    (mean2d, conic, log_op, _, _, valid), _ = prepare_sorted_splats(
        gaussians, pose, fx, fy, cx, cy, scale_modifier, active_sh_degree,
        height, width,
    )
    return rasterize_pallas_tiled.tile_overflow(
        mean2d, conic, log_op, valid, height=height, width=width,
        cap_factor=cf, dy_levels=dy, dx_levels=dx)


@functools.partial(
    jax.jit,
    static_argnames=("active_sh_degree", "height", "width", "cf", "dl"))
def _binned_overflow_impl(gaussians, pose, fx, fy, cx, cy, scale_modifier,
                          active_sh_degree: int, height: int, width: int,
                          cf=None, dl=None):
    (mean2d, conic, log_op, _, _, valid), _ = prepare_sorted_splats(
        gaussians, pose, fx, fy, cx, cy, scale_modifier, active_sh_degree,
        height, width,
    )
    return rasterize_pallas_binned.bin_overflow(
        mean2d, conic, log_op, valid, height=height, width=width,
        cap_factor=cf, d_levels=dl)


def _binned_backend_or_dense(gaussians, pose, camera, scale_modifier,
                             active_sh_degree, backend="pallas-binned") -> str:
    """Rate-limited overflow check; returns the backend to actually use.

    `backend` may carry explicit capacities ("pallas-binned:CF:DL" — e.g.
    auto-sized by rasterize_pallas_binned.bin_requirements); the check then
    probes those capacities, since scene content drifts during training.

    Host-level only: under an outer jit the inputs are tracers, the flag
    has no concrete value, and a traced render must stay shape-stable —
    the caller keeps the binned kernel and owns the capacity check
    (rasterize_pallas_binned.bin_overflow)."""
    if isinstance(gaussians.xyz, jax.core.Tracer) or isinstance(
            pose, jax.core.Tracer):
        return backend
    cf, dl = _parse_binned_caps(backend)
    key = (int(gaussians.xyz.shape[0]), camera.height, camera.width, cf, dl)
    n = _binned_call_count.get(key, 0)
    _binned_call_count[key] = n + 1
    if key not in _binned_demoted and n % _BINNED_CHECK_EVERY == 0:
        overflow = bool(_binned_overflow_impl(
            gaussians, pose, camera.fx, camera.fy, camera.cx, camera.cy,
            jnp.float32(scale_modifier), active_sh_degree,
            camera.height, camera.width, cf=cf, dl=dl))
        if overflow:
            _binned_demoted.add(key)
            if cf is not None:
                remedy = (f"re-probe binned_view_requirements for fresh "
                          f"capacities (current cap_factor={cf}, "
                          f"d_levels={dl})")
            else:
                remedy = ("raise rasterize_pallas_binned.CAP_FACTOR / "
                          "D_LEVELS")
            _log.warning(
                "binned rasterizer bin capacity exhausted for N=%d %dx%d "
                "(pairs would be dropped); auto-switching this signature to "
                "the dense pallas backend. To keep binning, %s.",
                *key[:3], remedy)
    return "pallas" if key in _binned_demoted else backend


def _tiled_backend_or_dense(gaussians, pose, camera, scale_modifier,
                            active_sh_degree,
                            backend="pallas-tiled") -> str:
    """Rate-limited overflow check for the 2-D tiled backend — same
    contract and demotion semantics as _binned_backend_or_dense."""
    if isinstance(gaussians.xyz, jax.core.Tracer) or isinstance(
            pose, jax.core.Tracer):
        return backend
    cf, dy, dx = _parse_tiled_caps(backend)
    key = ("tiled", int(gaussians.xyz.shape[0]), camera.height,
           camera.width, cf, dy, dx)
    n = _binned_call_count.get(key, 0)
    _binned_call_count[key] = n + 1
    if key not in _binned_demoted and n % _BINNED_CHECK_EVERY == 0:
        overflow = bool(_tiled_overflow_impl(
            gaussians, pose, camera.fx, camera.fy, camera.cx, camera.cy,
            jnp.float32(scale_modifier), active_sh_degree,
            camera.height, camera.width, cf=cf, dy=dy, dx=dx))
        if overflow:
            _binned_demoted.add(key)
            _log.warning(
                "tiled rasterizer capacity exhausted for N=%d %dx%d "
                "(pairs would be dropped); auto-switching this signature "
                "to the dense pallas backend. To keep tiling, re-probe "
                "tiled_view_requirements (current cf=%s dy=%s dx=%s).",
                key[1], key[2], key[3], cf, dy, dx)
    return "pallas" if key in _binned_demoted else backend


def render(
    gaussians: GaussianModel,
    camera: Camera,
    pose: Optional[jax.Array] = None,
    bg: Optional[jax.Array] = None,
    scale_modifier: float = 1.0,
    active_sh_degree: Optional[int] = None,
    chunk: int = 256,
    backend: str = "oracle",
) -> RenderOut:
    """Render one view.

    Args:
      gaussians: scene parameters (raw, pre-activation).
      camera: intrinsics + fallback pose + static H/W.
      pose: optional [7] learnable w2c pose overriding camera.pose — pass
        `gaussians.get_pose(uid)` during joint optimization (reference
        train.py:152-158).
      bg: [3] background (reference default black, train.py:105-107).
      active_sh_degree: SH bands to evaluate (reference ramps this up during
        training, train.py:148-149); defaults to max.
      backend: 'oracle' (pure-jnp scan) or 'pallas' (tile kernel).
    """
    if pose is None:
        pose = camera.pose
    if bg is None:
        bg = jnp.zeros(3, jnp.float32)
    if active_sh_degree is None:
        active_sh_degree = gaussians.max_sh_degree
    if backend == "auto":
        # single-render calls default to the dense kernel; the places that
        # can amortize a measurement (the training loop's probe blocks,
        # pipelines.render_pipeline.resolve_backend) implement the real
        # dense-vs-binned auto-selection
        backend = "pallas"
    if backend.startswith("pallas-binned"):
        backend = _binned_backend_or_dense(
            gaussians, pose, camera, scale_modifier, active_sh_degree,
            backend)
    elif backend.startswith("pallas-tiled"):
        backend = _tiled_backend_or_dense(
            gaussians, pose, camera, scale_modifier, active_sh_degree,
            backend)
    return _render_impl(
        gaussians,
        pose,
        camera.fx,
        camera.fy,
        camera.cx,
        camera.cy,
        bg,
        jnp.float32(scale_modifier),
        active_sh_degree,
        camera.height,
        camera.width,
        chunk,
        backend,
    )
