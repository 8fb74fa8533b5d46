"""Rasterization throughput benchmark (runs on the real TPU chip).

Measures the full training-iteration hot path — pose-differentiable render
forward + backward + grouped Adam update — at an InstantSplat-scale workload,
and reports megapixels/s rasterized fwd+bwd per chip (BASELINE.json north-star
metric).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "Mpix/s", "vs_baseline": N}

vs_baseline: anchored to the BASELINE.md north-star budget — a 3-view scene
end-to-end (init + 1000-iter joint opt) in < 60 s per host. At the reference
training resolution (512x384 = 0.1966 Mpix/iter, gaussian_renderer call
shape), 1000 iterations are 196.6 Mpix of fwd+bwd rasterization; giving
training ~20 s of the 60 s budget (the rest goes to the MASt3R forward
passes + alignment, the dominant init cost) requires 196.6 / 20 ~= 10
Mpix/s. The reference publishes no per-iteration GPU throughput
(train_time.txt records only wall totals), so this budget-derived figure is
the ratio's denominator; the absolute value is the honest number.
"""

from __future__ import annotations

import json
import time

import numpy as np

# 196.6 Mpix (1000 iters @ 512x384) / 20 s training share of the 60 s
# end-to-end north-star budget (see module docstring).
BASELINE_MPIX_S = 10.0

# Workload: between BASELINE.json configs 1 and 2 — 512x384 render, 100k
# Gaussians (a typical 3-view co-vis-masked point count), SH degree 3.
# TRAIN_IN first runs real optimization steps so opacities/scales reach a
# mid-training distribution (a fresh random scene never saturates
# transmittance and understates the early-termination machinery that real
# joint optimization exercises).
N_GAUSS = 100_000
H, W = 384, 512
TRAIN_IN = 150
SCAN_K = 50  # iterations fused per dispatch (the production loop's
# lax.scan block size — trainer.TrainerConfig.log_every semantics)
WARMUP_BLOCKS = 1
BLOCKS = 4


def main():
    import jax
    import jax.numpy as jnp

    from instantsplat_tpu.models.camera import Camera, stack_cameras
    from instantsplat_tpu.models.gaussians import GaussianModel
    from instantsplat_tpu.opt import GaussianOptimizer, OptimizationConfig
    from instantsplat_tpu.pipelines.trainer import make_train_scan

    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    pts = jax.random.normal(ks[0], (N_GAUSS, 3)) * 1.5 + jnp.array([0.0, 0.0, 6.0])
    cols = jax.random.uniform(ks[1], (N_GAUSS, 3))
    poses = jnp.tile(jnp.array([1.0, 0, 0, 0, 0, 0, 0]), (2, 1))
    params = GaussianModel.create_from_pcd(pts, cols, cam_poses=poses, max_sh_degree=3)

    # GT = renders of an opaque variant of the same scene, so the burn-in
    # drives opacities toward a fittable surface (realistic termination
    # behavior) instead of chasing per-pixel noise.
    from instantsplat_tpu.render.driver import render as _render

    opaque = params.replace(
        opacity=jnp.full_like(params.opacity, 2.0))  # sigmoid(2) ~ 0.88
    cams = []
    for i in range(2):
        cam0 = Camera.create(np.eye(3), np.zeros(3), fx=400.0, fy=400.0,
                             height=H, width=W, uid=i)
        gt = _render(opaque, cam0, pose=params.get_pose(i),
                     backend="pallas").render
        cams.append(cam0.replace(image=jnp.clip(gt, 0.0, 1.0)))
    stacked = stack_cameras(cams)

    opt = GaussianOptimizer(OptimizationConfig(optim_pose=True), total_iterations=1000)
    state = opt.init(params)

    backend = "pallas"
    try:
        from instantsplat_tpu.ops import rasterize_pallas  # noqa: F401
    except Exception:
        backend = "oracle"

    # Measure the production loop's scanned block: SCAN_K iterations
    # (render fwd+bwd + Adam each) fused into one XLA dispatch
    # (trainer.make_train_scan — same math as the per-step API).
    block = make_train_scan(opt, stacked, jnp.zeros(3), 0.2,
                            backend=backend, chunk=512)

    def run_blocks(n_blocks, it0):
        nonlocal params, state
        it = it0
        for _ in range(n_blocks):
            vids = jnp.asarray(np.arange(it, it + SCAN_K) % 2, jnp.int32)
            its = jnp.arange(it, it + SCAN_K, dtype=jnp.int32)
            params, state, m = block(params, state, vids, its, 3)
            it += SCAN_K
        # host-scalar read, not block_until_ready: on axon the latter can
        # return before execution (observed an impossible 12.6 Gpix/s
        # headline); the float() forces the whole chained queue to drain
        float(jnp.sum(m["loss"]))
        return it

    it = run_blocks(TRAIN_IN // SCAN_K, 1)  # burn-in to mid-training state
    it = run_blocks(WARMUP_BLOCKS, it)
    # optional profile of the timed region (INSTANTSPLAT_PROFILE_DIR=...);
    # off by default to keep the one-JSON-line contract
    import os as _os

    from instantsplat_tpu.utils.profiling import profile_trace

    t0 = time.perf_counter()
    with profile_trace(_os.environ.get("INSTANTSPLAT_PROFILE_DIR")):
        run_blocks(BLOCKS, it)
    dt = time.perf_counter() - t0

    mpix_s = H * W * BLOCKS * SCAN_K / dt / 1e6
    result = {
        "metric": f"train-iter Mpix/s fwd+bwd per chip ({backend}, {N_GAUSS} gauss, {W}x{H})",
        "value": round(mpix_s, 3),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 3),
    }
    result["extra"] = _extra_metrics_guarded()
    print(json.dumps(result))


def _extra_metrics_guarded():
    """_extra_metrics under a SIGALRM hard cap: its per-section budget
    checks run BEFORE each section, so one slow remote compile inside a
    section could otherwise hold the JSON line past the driver's bench
    timeout. The alarm interrupts whatever is in flight; the section's
    try/except records it and the primary metric still prints."""
    import os
    import signal

    budget = float(os.environ.get("INSTANTSPLAT_BENCH_BUDGET_S", 480))
    if os.name != "posix" or budget <= 0:
        return _extra_metrics()

    def _raise(signum, frame):
        raise TimeoutError("bench extras budget exhausted")

    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(int(budget))
    try:
        return _extra_metrics()
    except TimeoutError:
        return {"extras_error": "budget_exhausted"}
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def _extra_metrics():
    """Secondary north-star metrics (VERDICT r3 item 2): MASt3R ms/pair +
    MFU, aligner s/300it, and the last recorded oracle e2e stage table
    (scripts/bench_e2e.py writes BENCH_E2E.json; running minutes of e2e
    inline would blow the bench budget). Each is time-guarded and
    best-effort — a missing key means it was skipped, not zero."""
    import json as _json
    import os
    import time as _time
    from pathlib import Path

    budget = float(os.environ.get("INSTANTSPLAT_BENCH_BUDGET_S", 480))
    t0 = _time.time()
    extra = {}

    import jax
    import jax.numpy as jnp
    import numpy as np

    # ---- aligner: 300-iteration 3-view alignment at 512-res ----
    try:
        from instantsplat_tpu.init import GlobalAligner, make_pair_indices
        from instantsplat_tpu.init.aligner import PairPrediction

        rng = np.random.default_rng(0)
        h, w = 384, 512
        edges = make_pair_indices(3, "complete", symmetrize=True)
        base = rng.random((len(edges), h, w, 3)).astype(np.float32) * 2 + 1
        preds = PairPrediction(
            edges=edges, pred_i=base, pred_j=base * 1.1,
            conf_i=1 + np.exp(rng.random((len(edges), h, w),
                                         ).astype(np.float32)),
            conf_j=1 + np.exp(rng.random((len(edges), h, w),
                                         ).astype(np.float32)))
        al = GlobalAligner(preds)
        al.init_mst(focal_avg=True)
        al.align(niter=10)  # compile warm-up (separate block-size compile)
        t1 = _time.time()
        al.align(niter=300)
        extra["aligner_s_300it_3view"] = round(_time.time() - t1, 3)
    except Exception as e:  # noqa: BLE001
        extra["aligner_error"] = type(e).__name__

    # ---- MASt3R stage-1 at its PRODUCTION operating points (bf16) ----
    # Two regimes are recorded (VERDICT r4 item 3): the saturated batched
    # point (pair batch 24 — what init_geo runs on >=5-view scenes, and
    # the operating point the README/PERF_NOTES MFU claims are made at),
    # and the honest small-scene point: a 3-view scene has exactly 3
    # images / 6 directed pairs, so its batches CANNOT fill 24 — it is
    # measured at its true shapes (encode bs=3, decode bs=6) and reported
    # as measured seconds, not a projection from the big-batch rate.
    if _time.time() - t0 < budget * 0.6:
        try:
            from instantsplat_tpu.models import mast3r

            cfg = mast3r.MASt3RConfig()
            params = mast3r.cast_params(mast3r.init_params(cfg, seed=0),
                                        jnp.bfloat16)
            h, w = 384, 512
            peak = 197e12  # v5e bf16 peak FLOP/s
            reps = 4  # per-rep input perturbation + one host sync
            # (identical dispatches are value-deduped on axon — CLAUDE.md)
            rng = np.random.default_rng(0)

            @jax.jit
            def encode(p, im):
                return mast3r.encode_images(p, cfg, im)

            @jax.jit
            def decode(p, f1, p1, f2, p2):
                return mast3r.forward_from_encoded(p, cfg, f1, p1, f2, p2,
                                                   h, w)

            def _flops(compiled):
                try:
                    ca = compiled.cost_analysis()
                    if isinstance(ca, (list, tuple)):
                        ca = ca[0]
                    return float(ca["flops"])
                except Exception:  # noqa: BLE001
                    return None

            def time_encode(bs):
                imgs = jnp.asarray(rng.random((bs, h, w, 3), np.float32),
                                   jnp.bfloat16)
                fl = _flops(encode.lower(params, imgs).compile())
                feats, pos = encode(params, imgs)
                float(jnp.sum(feats[:1, :1].astype(jnp.float32)))
                t1 = _time.perf_counter()
                for r in range(reps):
                    feats, pos = encode(
                        params, imgs + jnp.bfloat16(1e-6 * (r + 1)))
                float(jnp.sum(feats[:1, :1].astype(jnp.float32)))
                dt = (_time.perf_counter() - t1) / reps
                return dt, fl, feats, pos

            def time_decode(feats, pos, bs):
                f1, p1 = feats[:bs], pos[:bs]
                f2 = jnp.roll(f1, 1, axis=0)
                p2 = jnp.roll(p1, 1, axis=0)
                fl = _flops(decode.lower(params, f1, p1, f2, p2).compile())
                r1, _ = decode(params, f1, p1, f2, p2)
                float(jnp.sum(r1["pts3d"][:1, :1, :1].astype(jnp.float32)))
                t1 = _time.perf_counter()
                for r in range(reps):
                    r1, _ = decode(params,
                                   f1 + jnp.bfloat16(1e-6 * (r + 1)),
                                   p1, f2, p2)
                float(jnp.sum(r1["pts3d"][:1, :1, :1].astype(jnp.float32)))
                dt = (_time.perf_counter() - t1) / reps
                return dt, fl

            # saturated point: batch 24 (init_geo's production pair batch)
            bs = 24
            dt_e, fl_e, feats, pos = time_encode(bs)
            extra["mast3r_encode_ms_image_bf16_bs24"] = round(
                dt_e / bs * 1e3, 2)
            if fl_e:
                extra["mast3r_encode_mfu_bs24"] = round(
                    fl_e / dt_e / peak, 3)
            dt_d, fl_d = time_decode(feats, pos, bs)
            extra["mast3r_decode_ms_pair_bf16_bs24"] = round(
                dt_d / bs * 1e3, 2)
            if fl_d:
                extra["mast3r_decode_mfu_bs24"] = round(
                    fl_d / dt_d / peak, 3)

            # small-scene point: the true --n_views 3 shapes
            if _time.time() - t0 < budget * 0.8:
                dt_e3, _, feats3, pos3 = time_encode(3)
                f6 = jnp.concatenate([feats3, feats3])
                p6 = jnp.concatenate([pos3, pos3])
                dt_d6, _ = time_decode(f6, p6, 6)
                extra["mast3r_stage1_s_at_3views_measured"] = round(
                    dt_e3 + dt_d6, 3)
                extra["mast3r_encode_ms_image_bf16_bs3"] = round(
                    dt_e3 / 3 * 1e3, 2)
                extra["mast3r_decode_ms_pair_bf16_bs6"] = round(
                    dt_d6 / 6 * 1e3, 2)
        except Exception as e:  # noqa: BLE001
            extra["mast3r_error"] = type(e).__name__

    # ---- last recorded e2e stage table (if any) ----
    try:
        p = Path(__file__).parent / "BENCH_E2E.json"
        if p.exists():
            e2e = _json.loads(p.read_text())
            # a stale table must not impersonate a fresh measurement:
            # surface its age right next to the replayed numbers
            rec = e2e.get("recorded_unix")
            if rec is not None:
                e2e["e2e_age_days"] = round(
                    (_time.time() - float(rec)) / 86400.0, 2)
            extra["e2e"] = e2e
    except Exception:
        pass
    return extra


def _main_with_retry():
    """Re-exec once on transient backend failures.

    The dev tunnel's TPU worker can restart mid-run (surfaces as
    jax.errors.JaxRuntimeError FAILED_PRECONDITION / "TPU backend error");
    a fresh process gets a fresh client and the persistent compilation
    cache makes the retry cheap. Real failures reproduce and still fail."""
    import os
    import subprocess
    import sys

    if os.environ.get("INSTANTSPLAT_BENCH_RETRY"):
        main()
        return
    # retry only on known-transient backend signatures; deterministic
    # failures (and SIGINT) pass straight through
    transient = ("FAILED_PRECONDITION", "TPU worker crashed",
                 "TPU backend error", "DEADLINE_EXCEEDED", "UNAVAILABLE")
    env = dict(os.environ, INSTANTSPLAT_BENCH_RETRY="1")
    for attempt in range(2):
        proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                              env=env, stderr=subprocess.PIPE)
        sys.stderr.buffer.write(proc.stderr or b"")
        sys.stderr.flush()
        if proc.returncode == 0:
            return
        err = (proc.stderr or b"").decode(errors="replace")
        is_transient = any(sig in err for sig in transient)
        if proc.returncode < 0 or not is_transient or attempt == 1:
            # signal (e.g. SIGINT rc=-2) / deterministic / out of retries
            break
        print(f"bench attempt {attempt + 1} hit a transient backend "
              f"failure (rc={proc.returncode}); retrying", file=sys.stderr)
    sys.exit(proc.returncode)


if __name__ == "__main__":
    _main_with_retry()
