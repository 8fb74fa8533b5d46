"""Joint Gaussian + camera-pose optimization loop.

TPU-native re-design of the reference training stage (train.py:88-231):
each iteration renders one training view with its learnable pose, computes
0.8*L1 + 0.2*(1-SSIM) against the ground truth, and applies the grouped
(optionally per-point) Adam update — but here the render + loss + backward +
update is ONE jitted XLA program (`train_step`), with parameters donated
between steps so the whole loop runs on-device without host round-trips.

Parity notes:
- view sampling: random without replacement per epoch (reference
  train.py:152-155 pops from a shuffled viewpoint stack);
- SH degree ramp: +1 band every 1000 iterations (train.py:148-149);
- background: white/black by config; optional random background per
  iteration (arguments/__init__.py:90 `random_background`);
- densification is intentionally absent: the reference disables it for
  sparse-view joint optimization (train.py:196-206 commented out; the point
  count is fixed from init — SURVEY.md §2.3).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from instantsplat_tpu.models.camera import Camera, stack_cameras
from instantsplat_tpu.utils import profiling
from instantsplat_tpu.models.gaussians import GaussianModel
from instantsplat_tpu.opt.gaussian_opt import (
    AdamState,
    GaussianOptimizer,
    OptimizationConfig,
)
from instantsplat_tpu.ops.losses import photometric_loss, psnr
from instantsplat_tpu.render.driver import render


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    iterations: int = 1000
    white_background: bool = False
    backend: str = "oracle"
    chunk: int = 256
    sh_up_interval: int = 1000  # reference train.py:148-149
    seed: int = 0
    log_every: int = 100
    # Fuse log_every iterations into one lax.scan dispatch (identical math;
    # removes per-iteration host round-trips). Disabled automatically when a
    # live viewer needs per-iteration polling.
    scan: bool = True
    # Upper bound on one scanned dispatch's WALL time. Large scenes make a
    # log_every-iteration block arbitrarily slow, and the runtime may
    # enforce an execution deadline (the axon dev worker aborts executions
    # at ~60 s, surfacing as "TPU worker crashed"); the trainer times a
    # warm probe block and caps subsequent blocks to divisors of log_every
    # that fit this budget. Override: INSTANTSPLAT_DISPATCH_BUDGET_S.
    dispatch_budget_s: float = 20.0
    # When set, wrap the second (warm, post-compile) training block in a
    # jax.profiler trace written to this directory (SURVEY.md §5;
    # utils/profiling.py). No-op on backends without profiler support.
    profile_dir: str | None = None
    # Multi-chip training (parallel/sharding.py): shard every render over an
    # n_devices 1-D mesh. 0/None = single-device; -1 = all local devices.
    # shard_axis: 'pixels' (row blocks per chip, Gaussians replicated) or
    # 'gaussians' (depth slices per chip — the large-N regime).
    n_devices: Optional[int] = None
    shard_axis: str = "pixels"


def _render_rgb(p, cam, pose, bg, active_sh, chunk, backend, mesh,
                shard_axis):
    """One view's RGB on the single-device driver or sharded over `mesh`
    (parallel/sharding.py row-block / depth-slice renders — the production
    multi-chip path; gradients psum automatically through the shard_map
    transpose)."""
    if mesh is None:
        out = render(p, cam, pose=pose, bg=bg, active_sh_degree=active_sh,
                     chunk=chunk, backend=backend)
        return out.render
    from instantsplat_tpu.parallel import sharding as _sharding

    if shard_axis == "gaussians":
        rgb, _, _ = _sharding.gaussian_sharded_render(
            p, cam, mesh, pose=pose, bg=bg, active_sh_degree=active_sh)
    else:
        rgb, _, _ = _sharding.sharded_render(
            p, cam, mesh, pose=pose, bg=bg, active_sh_degree=active_sh,
            chunk=chunk, backend=backend)
    return rgb


def make_train_step(
    optimizer: GaussianOptimizer,
    cameras: Camera,  # batched [V, ...] pytree
    bg: jax.Array,
    lambda_dssim: float,
    backend: str,
    chunk: int,
    mesh=None,
    shard_axis: str = "pixels",
):
    """Build the jitted (render -> loss -> grad -> update) step."""

    # NOTE: no buffer donation — freshly-initialized Adam moments are
    # XLA-deduplicated zero constants, and donating aliased buffers is an
    # error. The win from donation here is small (params are MBs, not GBs).
    @functools.partial(jax.jit, static_argnames=("active_sh",))
    def train_step(
        params: GaussianModel,
        opt_state: AdamState,
        view_idx,
        iteration,
        active_sh: int,
    ):
        cam = jax.tree.map(lambda x: x[view_idx], cameras)

        def loss_fn(p: GaussianModel):
            # pose keyed by the camera's uid (== its global view index;
            # view_idx may be group-local on mixed-aspect scenes)
            pose = p.get_pose(cam.uid)
            rgb = _render_rgb(p, cam, pose, bg, active_sh, chunk, backend,
                              mesh, shard_axis)
            loss, aux = photometric_loss(rgb, cam.image, lambda_dssim)
            aux["psnr"] = psnr(rgb, cam.image)
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        params, opt_state = optimizer.step(params, grads, opt_state, iteration)
        metrics = dict(loss=loss, **aux)
        return params, opt_state, metrics

    return train_step


def make_train_scan(
    optimizer: GaussianOptimizer,
    cameras: Camera,  # batched [V, ...] pytree
    bg: jax.Array,
    lambda_dssim: float,
    backend: str,
    chunk: int,
    mesh=None,
    shard_axis: str = "pixels",
):
    """Build a jitted k-iteration training block: one XLA dispatch runs k
    (render -> loss -> grad -> Adam) steps via lax.scan.

    The reference's loop (train.py:124-211) dispatches CUDA work per
    iteration from python; on TPU a scanned block removes the per-iteration
    host round-trip entirely (and on the axon dev tunnel, the per-dispatch
    latency — CLAUDE.md timing notes). Per-iteration semantics are
    preserved exactly: the LR schedules see the true iteration number
    (carried in the scanned xs), and view indices are precomputed host-side
    with the same random-without-replacement policy. `active_sh` is static
    per block, so callers must split blocks at sh_up_interval boundaries
    (train_joint does; the ramp only changes every 1000 iterations).
    """

    # No donation for the same aliasing reason as make_train_step.
    @functools.partial(jax.jit, static_argnames=("active_sh",))
    def train_block(
        params: GaussianModel,
        opt_state: AdamState,
        view_ids,  # [k] int32
        iterations,  # [k] int32 (true iteration numbers)
        active_sh: int,
    ):
        def body(carry, x):
            p, s = carry
            view_idx, it = x
            cam = jax.tree.map(lambda c: c[view_idx], cameras)

            def loss_fn(pp: GaussianModel):
                pose = pp.get_pose(cam.uid)
                rgb = _render_rgb(pp, cam, pose, bg, active_sh, chunk,
                                  backend, mesh, shard_axis)
                loss, aux = photometric_loss(rgb, cam.image, lambda_dssim)
                aux["psnr"] = psnr(rgb, cam.image)
                return loss, aux

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
            p, s = optimizer.step(p, grads, s, it)
            return (p, s), dict(loss=loss, **aux)

        (params, opt_state), metrics = jax.lax.scan(
            body, (params, opt_state), (view_ids, iterations)
        )
        # last-iteration metrics (what the per-step API would report)
        metrics = jax.tree.map(lambda x: x[-1], metrics)
        return params, opt_state, metrics

    return train_block


# backend='auto': refuse binned/tiled above these capacities (slot memory
# and bin-construction cost scale with cap_factor * N and with the
# candidate level product; extreme requirements mean the scene is
# dense-kernel territory anyway)
_MAX_BINNED_CAP_FACTOR = 16
# 128, not 64: the round-5 e2e scene (150k-pt co-vis+max_pts downsample,
# whose sparsified KNN scales grow a giant-splat radius tail) sizes
# binned at dl=51 and drifts past 64 within 300 iterations — and the
# dense fallback measured 3.7-11x SLOWER there (718 vs 196 ms/iter at
# iter 0; plane-400k 1800 vs 236). The cap only guards absurd sort/memory
# blowups; the timed auto-probe is what actually picks the backend.
_MAX_BINNED_D_LEVELS = 128
_MAX_TILED_LEVEL_PRODUCT = 64  # dy * dx (the candidate sort is O(N*dy*dx))

# Periodic backend re-probe cadence (iterations); module-level so tests can
# shrink it to exercise the re-probe path
_REPROBE_EVERY = 250


def _tiled_candidate(params, camera) -> Optional[str]:
    """'pallas-tiled:CF:DY:DX' sized for the CURRENT scene, or None when
    out of range (huge splats blow the level product; huge images blow
    the int32 tile*splat key space)."""
    from instantsplat_tpu.ops.rasterize_pallas_tiled import (
        BLOCK_ROWS, COL_W, _round_up,
    )
    from instantsplat_tpu.render.driver import tiled_view_requirements

    n = int(params.xyz.shape[0])
    n_tiles = ((_round_up(camera.height, BLOCK_ROWS) // BLOCK_ROWS)
               * (_round_up(camera.width, COL_W) // COL_W))
    if n_tiles * (n + 1) >= 2**31:
        return None
    cf, dy, dx = tiled_view_requirements(params, params.get_pose(0), camera)
    if cf > _MAX_BINNED_CAP_FACTOR or dy * dx > _MAX_TILED_LEVEL_PRODUCT:
        return None
    return f"pallas-tiled:{cf}:{dy}:{dx}"


def _binned_candidate(params, camera) -> Optional[str]:
    """Host-side sizing for backend='auto': the non-dense candidate
    backend string whose capacities hold every splat of the CURRENT scene
    state (dense never drops splats — the same guarantee the driver's
    demotion guard enforces), or None when the needed capacity is
    unreasonable. Prefers the 2-D tiled kernel (strictly tighter culling
    than the 1-D binned one — PERF_NOTES roadmap item 6); falls back to
    1-D binned when the tile levels are out of range (giant-splat
    scenes)."""
    try:
        cand = _tiled_candidate(params, camera)
        if cand is not None:
            return cand
        from instantsplat_tpu.render.driver import binned_view_requirements

        cf, dl = binned_view_requirements(params, params.get_pose(0), camera)
        if cf > _MAX_BINNED_CAP_FACTOR or dl > _MAX_BINNED_D_LEVELS:
            return None
        return f"pallas-binned:{cf}:{dl}"
    except Exception as e:  # noqa: BLE001 — auto must never kill training,
        # but a swallowed probe failure silently forfeits the faster
        # backend (observed: a transient tunnel error cost a 413k-point
        # scene its binned candidate) — make it visible
        import logging

        logging.getLogger(__name__).warning(
            "backend auto: binned sizing probe failed (%s: %s); "
            "falling back to dense", type(e).__name__, e)
        return None


def _is_capacity_backend(name: Optional[str]) -> bool:
    return bool(name) and name.startswith(("pallas-binned", "pallas-tiled"))


def _fit_block(rate: Optional[float], budget: float, log_every: int,
               fallback: int) -> int:
    """Largest divisor of log_every whose block duration at `rate`
    (seconds/iter) fits the dispatch budget — divisors keep block
    boundaries aligned with log boundaries so only one extra scan length
    ever compiles. Falls back to `fallback` when no rate is known."""
    if rate is None or budget <= 0:
        return fallback
    fitting = [d for d in range(1, log_every + 1)
               if log_every % d == 0 and d * rate <= budget]
    return max(fitting) if fitting else 1


def _binned_caps_grew(old: str, new: str) -> bool:
    """True when `new`'s capacities exceed `old`'s in any dimension — the
    only case a rebuilt (recompiled) scan program is required for
    correctness; smaller fresh requirements are still drop-free under the
    baked (larger) capacities. A kernel-kind change (tiled <-> binned)
    always rebuilds."""
    okind, *ocaps = old.split(":")
    nkind, *ncaps = new.split(":")
    if okind != nkind or len(ocaps) != len(ncaps) or not ocaps:
        return old != new
    return any(int(nc) > int(oc) for oc, nc in zip(ocaps, ncaps))


def train_joint(
    params: GaussianModel,
    cameras: list[Camera],
    opt_cfg: OptimizationConfig = OptimizationConfig(),
    trainer_cfg: TrainerConfig = TrainerConfig(),
    spatial_lr_scale: float = 1.0,
    confidence_lr: Optional[np.ndarray] = None,
    progress_cb: Optional[Callable[[int, dict], None]] = None,
    opt_state=None,
    first_iter: int = 0,
    live_ref: Optional[list] = None,
    viewer=None,
    mesh=None,
):
    """Run the joint optimization loop.

    Returns (params, opt_state, history) where history is a list of
    (iteration, metrics-dict) at log_every cadence plus the final step.
    Pass (opt_state, first_iter) from a loaded checkpoint to resume
    (reference train.py:101-103 restore path). `viewer` is an optional
    render.network_gui.NetworkGUI polled between iterations (the
    reference's SIBR loop, train.py:125-138, off by default).

    Multi-chip: pass `mesh` (1-D jax.sharding.Mesh) or set
    trainer_cfg.n_devices and a mesh is built here; every render inside the
    scanned/governed loop is then sharded per trainer_cfg.shard_axis
    (parallel/sharding.py), with Gaussian/pose gradients psum'd over ICI.
    """
    # Mixed-aspect scenes (e.g. portrait + landscape phone captures; the
    # reference trains these per-view at each image's own shape): group
    # views by raster, one compiled step per shape, random view order
    # preserved exactly. Uniform scenes use the scanned/governed loop.
    mixed_shapes = len({(c.height, c.width) for c in cameras}) > 1
    stacked = None if mixed_shapes else stack_cameras(cameras)
    n_views = len(cameras)
    bg = jnp.ones(3) if trainer_cfg.white_background else jnp.zeros(3)

    if mesh is None and trainer_cfg.n_devices not in (None, 0):
        from instantsplat_tpu.parallel.sharding import make_mesh

        ndev = trainer_cfg.n_devices
        ndev = len(jax.devices()) if ndev == -1 else ndev
        if ndev > 1:
            mesh = make_mesh(ndev)
    if mesh is not None:
        print(f"[train] sharding renders over {mesh.devices.size} devices "
              f"(axis: {trainer_cfg.shard_axis})", flush=True)

    optimizer = GaussianOptimizer(
        opt_cfg,
        spatial_lr_scale=spatial_lr_scale,
        total_iterations=trainer_cfg.iterations,
    )
    if opt_state is None:
        opt_state = optimizer.init(params, confidence_lr=confidence_lr)

    rng = np.random.RandomState(trainer_cfg.seed)
    queue: list[int] = []

    def next_view() -> int:
        nonlocal queue
        if not queue:
            queue = list(rng.permutation(n_views))
        return int(queue.pop())

    history = []
    t0 = time.time()

    def log(it, metrics):
        m = {k: float(v) for k, v in metrics.items()}
        m["elapsed_s"] = time.time() - t0
        history.append((it, m))
        if live_ref is not None:
            live_ref[0] = params  # expose latest params to callbacks
        if progress_cb is not None:
            progress_cb(it, m)

    use_scan = trainer_cfg.scan and viewer is None and not mixed_shapes
    if use_scan:
        import os as _os

        backend = trainer_cfg.backend
        alt_fn = None
        cur_name = backend
        alt_name = None
        if backend == "auto" and mesh is not None:
            # sharded renders use the dense kernel per chip; the binned
            # probe's capacity sizing is per-chip-row-block dependent, so
            # auto simply resolves to dense under a mesh
            backend = "pallas"
        if backend == "auto":
            # Backend auto-selection: the dense kernel wins when early
            # termination / the row bitmap bite (opaque converged scenes,
            # depth-diverse clouds); the binned kernel wins when they
            # don't (near-uniform depth — e.g. a dominant plane — spreads
            # every chunk across the whole image; measured 1590 vs 290
            # ms/iter at 413k splats). Probe both with warm blocks and
            # keep the faster; skip binned when its bins would overflow
            # (the dense kernel never drops splats).
            backend = "pallas"
            cur_name = backend
            alt_backend = _binned_candidate(params, cameras[0])
            if alt_backend is not None:
                alt_name = alt_backend
                alt_fn = make_train_scan(
                    optimizer, stacked, bg, opt_cfg.lambda_dssim,
                    alt_backend, trainer_cfg.chunk,
                )
        block_fn = make_train_scan(
            optimizer, stacked, bg, opt_cfg.lambda_dssim,
            backend, trainer_cfg.chunk,
            mesh=mesh, shard_axis=trainer_cfg.shard_axis,
        )
        budget = float(_os.environ.get("INSTANTSPLAT_DISPATCH_BUDGET_S",
                                       trainer_cfg.dispatch_budget_s))
        # Dispatch-duration governor: the first two blocks run at a small
        # probe size (the first pays the compile; the second's wall time is
        # a clean per-iteration estimate), then the steady block size is
        # the largest divisor of log_every that fits the budget — divisors
        # keep block boundaries aligned with log boundaries so only one
        # extra scan length ever compiles.
        probe = max(1, min(10, trainer_cfg.log_every))
        block_cap: Optional[int] = (
            trainer_cfg.log_every if budget <= 0 and alt_fn is None
            else None)
        warm_probed = block_cap is not None
        n_probe_blocks = 4 if alt_fn is not None else 2
        per_iter_main: Optional[float] = None
        # Periodic backend RE-probe: the dense/binned crossover moves
        # during training (early low-opacity iterations are binned
        # territory; burned-in termination-saturated ones are dense's —
        # PERF_NOTES crossover table), so every `reprobe_every` iterations
        # one timed block runs on each backend and the faster keeps the
        # loop. Costs two syncs per window; a 4x regime flip dwarfs that.
        reprobe_every = _REPROBE_EVERY
        next_reprobe = first_iter + 1 + reprobe_every
        reprobe_state = 0  # 0 idle, 1 timing current, 2 timing other
        per_cur_probe: Optional[float] = None
        # Last measured seconds/iter for the current and alternate
        # backends. EVERY block's length must be fitted to the rate of
        # the backend that will actually run it: block_cap is fitted to
        # the current (winner) backend, so a block handed to a slower
        # program — the re-probe's state-2 timing block, or the blocks
        # after a demotion swap — can otherwise become a single dispatch
        # past the runtime's ~60 s execution deadline (measured: binned
        # 196 ms/iter fits 100-iter blocks; the first dense block after
        # a demotion at 718 ms/iter was a 72 s dispatch -> deterministic
        # "TPU worker crashed" at the same iteration on every retry).
        rate_cur: Optional[float] = None
        rate_alt: Optional[float] = None

        it = first_iter + 1
        block_idx = 0
        while it <= trainer_cfg.iterations:
            interval = trainer_cfg.sh_up_interval
            active_sh = min(it // interval, params.max_sh_degree)
            # Block ends at the next log boundary, but never crosses an
            # SH-ramp boundary (active_sh is static inside the block).
            end = min(
                trainer_cfg.iterations,
                ((it - 1) // trainer_cfg.log_every + 1) * trainer_cfg.log_every,
            )
            if it // interval < params.max_sh_degree:
                end = min(end, (it // interval + 1) * interval - 1)
            cap_this = block_cap or probe
            if reprobe_state == 2:
                # this block runs the ALTERNATE backend — bound its
                # length by that backend's last known rate, not the
                # current backend's (see rate_cur/rate_alt note above)
                cap_this = min(cap_this, _fit_block(
                    rate_alt, budget, trainer_cfg.log_every, probe))
            end = min(end, it + cap_this - 1)
            view_ids = np.array([next_view() for _ in range(it, end + 1)],
                                np.int32)
            iters = np.arange(it, end + 1, dtype=np.int32)
            # trace block 1 (block 0 pays the compile) when profiling is on
            do_trace = trainer_cfg.profile_dir is not None and block_idx == 1
            # auto backend: blocks 0-1 run the dense program, blocks 2-3
            # the binned one (each pair = compile + warm measurement)
            fn = (alt_fn if alt_fn is not None and block_idx in (2, 3)
                  else block_fn)
            if (warm_probed and alt_fn is not None and reprobe_state == 0
                    and it >= next_reprobe):
                # Before timing/adopting a backend, re-size the binned
                # kernel's capacities against the CURRENT scene: they were
                # baked into the backend string at iteration 0, the scene
                # drifts during training, and inside a jitted scan the
                # driver's overflow demotion guard cannot run (tracers) —
                # an overflowing binned program silently drops splats AND
                # times faster, biasing the re-probe toward adopting
                # exactly the broken configuration.
                binned_side = (
                    "cur" if _is_capacity_backend(cur_name)
                    else "alt" if _is_capacity_backend(alt_name)
                    else None)
                start_timing = True
                if binned_side is not None:
                    fresh = _binned_candidate(params, cameras[0])
                    old = cur_name if binned_side == "cur" else alt_name
                    if fresh is None:
                        # scene drifted out of binned territory entirely
                        if binned_side == "cur":
                            block_fn, alt_fn = alt_fn, block_fn
                            cur_name, alt_name = alt_name, cur_name
                            rate_cur, rate_alt = rate_alt, rate_cur
                            # the adopted backend may be much slower than
                            # the one block_cap was fitted to — refit now
                            # or the very next block can blow the ~60 s
                            # dispatch deadline
                            if budget > 0:
                                block_cap = _fit_block(
                                    rate_cur, budget,
                                    trainer_cfg.log_every, probe)
                            print("[train] backend auto: demoting binned at "
                                  f"iter {it} — required capacities now "
                                  "unreasonable for this scene "
                                  f"(blocks re-capped at {block_cap})",
                                  flush=True)
                        start_timing = False  # skip this window; retry later
                    elif _binned_caps_grew(old, fresh):
                        fn_new = make_train_scan(
                            optimizer, stacked, bg, opt_cfg.lambda_dssim,
                            fresh, trainer_cfg.chunk)
                        if binned_side == "cur":
                            block_fn, cur_name = fn_new, fresh
                        else:
                            alt_fn, alt_name = fn_new, fresh
                        print(f"[train] backend auto: binned capacities "
                              f"resized {old} -> {fresh} at iter {it}",
                              flush=True)
                if start_timing:
                    reprobe_state = 1
                    # drain previously enqueued async scan blocks so the
                    # timed block's wall time doesn't include the backlog
                    # (steady-state blocks don't sync; params chains
                    # through every enqueued block)
                    jax.block_until_ready(params)
                else:
                    next_reprobe = it + reprobe_every
            if reprobe_state == 2:
                fn = alt_fn
            t_blk = time.time()
            with profiling.profile_trace(trainer_cfg.profile_dir,
                                         enabled=do_trace):
                params, opt_state, metrics = fn(
                    params, opt_state, jnp.asarray(view_ids),
                    jnp.asarray(iters), active_sh,
                )
                if do_trace or not warm_probed or reprobe_state:
                    jax.block_until_ready(metrics)
            if reprobe_state == 1:
                per_cur_probe = (time.time() - t_blk) / max(1, end - it + 1)
                rate_cur = per_cur_probe
                reprobe_state = 2
            elif reprobe_state == 2:
                per_other = (time.time() - t_blk) / max(1, end - it + 1)
                if per_other < 0.87 * per_cur_probe:
                    block_fn, alt_fn = alt_fn, block_fn
                    cur_name, alt_name = alt_name, cur_name
                    rate_cur, rate_alt = per_other, per_cur_probe
                    print(f"[train] backend auto: switching at iter {it} — "
                          f"other backend {per_other * 1e3:.0f} ms/iter "
                          f"beats current {per_cur_probe * 1e3:.0f}",
                          flush=True)
                    winner_per_iter = per_other
                else:
                    rate_alt = per_other
                    winner_per_iter = per_cur_probe
                # re-fit the dispatch governor to the (possibly new)
                # backend's measured rate: a stale cap calibrated on a
                # faster program can push one scan block past the
                # runtime's ~60 s execution deadline
                if budget > 0:
                    block_cap = _fit_block(winner_per_iter, budget,
                                           trainer_cfg.log_every, probe)
                reprobe_state = 0
                next_reprobe = it + reprobe_every
            if block_cap is None and block_idx == 1:
                per_iter_main = (time.time() - t_blk) / max(1, end - it + 1)
            if block_cap is None and block_idx == n_probe_blocks - 1:
                per_iter = (time.time() - t_blk) / max(1, end - it + 1)
                if alt_fn is not None:
                    per_alt = per_iter
                    if per_alt < per_iter_main:
                        # swap (not assign): the dense fn must survive as
                        # the alternate so later re-probes compare the two
                        # real backends, not binned against itself
                        block_fn, alt_fn = alt_fn, block_fn
                        cur_name, alt_name = alt_name, cur_name
                        win, lose = "binned", "dense"
                    else:
                        per_iter = per_iter_main
                        per_alt, per_iter_main = per_iter_main, per_alt
                        win, lose = "dense", "binned"
                    print(f"[train] backend auto: {win} "
                          f"({per_alt * 1e3:.0f} ms/iter) beats {lose} "
                          f"({per_iter_main * 1e3:.0f} ms/iter)",
                          flush=True)
                    rate_alt = per_iter_main
                rate_cur = per_iter
                if budget <= 0:
                    block_cap = trainer_cfg.log_every
                else:
                    block_cap = _fit_block(per_iter, budget,
                                           trainer_cfg.log_every, probe)
                warm_probed = True
                if block_cap < trainer_cfg.log_every:
                    print(f"[train] dispatch governor: {per_iter * 1e3:.0f} "
                          f"ms/iter -> scan blocks capped at {block_cap} "
                          f"iterations (budget {budget:.0f}s)", flush=True)
            block_idx += 1
            if end % trainer_cfg.log_every == 0 or end == trainer_cfg.iterations:
                log(end, metrics)
            it = end + 1
        return params, opt_state, history

    backend = trainer_cfg.backend
    if backend == "auto" and (mesh is not None or mixed_shapes):
        backend = "pallas"
    if mixed_shapes:
        groups: dict[tuple, list[int]] = {}
        for idx, c in enumerate(cameras):
            groups.setdefault((c.height, c.width), []).append(idx)
        step_of_shape = {
            s: make_train_step(
                optimizer, stack_cameras([cameras[i] for i in idxs]), bg,
                opt_cfg.lambda_dssim, backend, trainer_cfg.chunk,
                mesh=mesh, shard_axis=trainer_cfg.shard_axis)
            for s, idxs in groups.items()
        }
        local_of = {gi: (s, k) for s, idxs in groups.items()
                    for k, gi in enumerate(idxs)}

        def run_step(view_idx, it, active_sh, p, st):
            s, k = local_of[view_idx]
            return step_of_shape[s](p, st, jnp.int32(k), jnp.int32(it),
                                    active_sh)
    else:
        step_fn = make_train_step(
            optimizer, stacked, bg, opt_cfg.lambda_dssim, backend,
            trainer_cfg.chunk, mesh=mesh, shard_axis=trainer_cfg.shard_axis,
        )

        def run_step(view_idx, it, active_sh, p, st):
            return step_fn(p, st, jnp.int32(view_idx), jnp.int32(it),
                           active_sh)

    for it in range(first_iter + 1, trainer_cfg.iterations + 1):
        if viewer is not None:
            _serve_viewer(viewer, params, trainer_cfg)
        view_idx = next_view()
        active_sh = min(it // trainer_cfg.sh_up_interval, params.max_sh_degree)
        params, opt_state, metrics = run_step(
            view_idx, it, active_sh, params, opt_state
        )
        if it % trainer_cfg.log_every == 0 or it == trainer_cfg.iterations:
            log(it, metrics)
    return params, opt_state, history


def _serve_viewer(viewer, params, trainer_cfg):
    """Answer at most one pending SIBR viewer request with a live render."""
    try:
        req = viewer.poll()
        if req is None:
            return
        out = render(params, req.camera,
                     scale_modifier=req.scaling_modifier,
                     backend=trainer_cfg.backend)
        viewer.send_image(np.asarray(out.render), verify="training")
    except Exception:  # the viewer must never kill training
        viewer.conn = None
