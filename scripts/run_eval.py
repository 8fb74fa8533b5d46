#!/usr/bin/env python
"""Evaluation orchestrator: the 5-stage pipeline over a list of scenes.

Equivalent of the reference scripts/run_eval.sh:56-165 — per scene:
init_geo -> train -> render(train) -> render(test, pose-opt) -> metrics —
with per-stage logs under <out>/logs/. The reference parallelizes scenes
across GPUs by polling nvidia-smi for a free device and launching each
scene's stage chain on it (run_eval.sh:42-50,145-165); `--jobs N` here is
the TPU-host equivalent — a slot-pool scheduler runs up to N scene chains
concurrently, each subprocess pinned to its slot's chip via
TPU_VISIBLE_DEVICES (one scene per chip on a multi-chip host). Default
--jobs 1 = sequential (single-chip machine).

  python scripts/run_eval.py --data <root> --out <root_out> \
      --dataset Tanks --scenes Barn Family --n_views 3 \
      --ckpt_path <mast3r.pth> [--iterations 1000] [--jobs 4]
"""

from __future__ import annotations

import argparse
import os
import queue
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path


def run_stage(cmd, log_path, env=None, timeout=None, retries=0):
    """Run one pipeline stage; with `timeout`, kill + retry a stalled
    stage (a dropped remote-backend RPC can hang a process forever with
    zero CPU — observed repeatedly on the dev tunnel; a fresh process
    rides the persistent compile cache, so retries are cheap)."""
    log_path.parent.mkdir(parents=True, exist_ok=True)
    for attempt in range(retries + 1):
        mode = "w" if attempt == 0 else "a"
        with open(log_path, mode) as log:
            t0 = time.time()
            print(f">> {' '.join(cmd)}"
                  + (f" (retry {attempt})" if attempt else ""))
            try:
                ret = subprocess.run(cmd, stdout=log,
                                     stderr=subprocess.STDOUT, env=env,
                                     timeout=timeout)
                rc = ret.returncode
            except subprocess.TimeoutExpired:
                rc = -1
                log.write(f"\n== stage timeout after {timeout}s ==\n")
            dt = time.time() - t0
            print(f"   -> {'ok' if rc == 0 else 'FAIL'} "
                  f"({dt:.0f}s, log: {log_path})")
            if rc == 0:
                return True
    return False


def slot_environment(slot: int, n_jobs: int) -> dict:
    """Subprocess env pinning a scene job to one accelerator slot.

    The reference binds each scene to a free GPU with CUDA_VISIBLE_DEVICES
    (run_eval.sh:52-55); the TPU-host equivalent is TPU_VISIBLE_DEVICES
    (libtpu per-process chip binding). With a single job the env passes
    through untouched so the single-chip default keeps working.
    """
    env = os.environ.copy()
    if n_jobs > 1:
        for key in ("TPU_VISIBLE_DEVICES", "CUDA_VISIBLE_DEVICES"):
            # a parent-set restriction is a device POOL to index into, not
            # a binding to inherit — inheriting it verbatim would pin every
            # concurrent job to the same chip(s)
            pool = env.get(key)
            if pool:
                visible = [d.strip() for d in pool.split(",") if d.strip()]
                env[key] = visible[slot % len(visible)]
            else:
                env[key] = str(slot)
    return env


def schedule_scenes(scene_fns, n_jobs):
    """Run scene thunks, at most `n_jobs` concurrent, each holding one
    slot id from a free pool for its whole stage chain — the scheduler
    shape of run_eval.sh:145-165 (poll for a free device, launch the
    scene on it in the background) without the 60 s polling loop.

    scene_fns: list of callables f(slot:int) -> bool. Returns the list of
    results in input order.
    """
    if n_jobs <= 1:
        return [fn(0) for fn in scene_fns]
    slots: queue.Queue = queue.Queue()
    for s in range(n_jobs):
        slots.put(s)
    results = [None] * len(scene_fns)

    def run(i):
        slot = slots.get()
        try:
            results[i] = scene_fns[i](slot)
        finally:
            slots.put(slot)

    with ThreadPoolExecutor(max_workers=n_jobs) as ex:
        list(ex.map(run, range(len(scene_fns))))
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--dataset", default="")
    ap.add_argument("--scenes", nargs="+", required=True)
    ap.add_argument("--n_views", type=int, default=3)
    ap.add_argument("--iterations", type=int, default=1000)
    ap.add_argument("--ckpt_path", default="")
    ap.add_argument("--max_pts", type=int, default=0,
                    help="cap the fused cloud at this many points "
                         "(confidence-weighted downsample; 0 = no cap — "
                         "reference sfm_utils.py:250 max_pts_num)")
    ap.add_argument("--skip_init", action="store_true",
                    help="scene dirs already contain sparse_{n}")
    ap.add_argument("--jobs", type=int, default=1,
                    help="concurrent scenes (one chip slot each)")
    ap.add_argument("--n_devices", type=int, default=0,
                    help="shard ONE scene over this many chips "
                         "(pair-DP init_geo + sharded train renders; "
                         "-1 = all local devices). Mutually exclusive "
                         "with --jobs > 1 scene-parallelism.")
    ap.add_argument("--optim_test_pose_iter", type=int, default=500,
                    help="test-time pose refinement iterations per view "
                         "(reference render.py:260)")
    ap.add_argument("--stage_timeout", type=int, default=0,
                    help="kill + retry (once) any stage exceeding this "
                         "many seconds (0 = no watchdog); guards against "
                         "stalled remote-backend RPCs")
    args = ap.parse_args()

    py = [sys.executable, "-m"]

    def make_scene_fn(scene):
        def run_scene(slot: int) -> bool:
            env = slot_environment(slot, args.jobs)
            watchdog = dict(timeout=args.stage_timeout or None,
                            retries=1 if args.stage_timeout else 0)
            src = Path(args.data) / args.dataset / scene / "24_views"
            if not src.exists():
                src = Path(args.data) / args.dataset / scene
            out = (Path(args.out) / args.dataset / scene
                   / f"{args.n_views}_views")
            logs = out / "logs"
            nv = str(args.n_views)
            it = str(args.iterations)

            shard = (["--n_devices", str(args.n_devices)]
                     if args.n_devices else [])
            ok = True
            if not args.skip_init:
                ok = run_stage(
                    py + ["instantsplat_tpu.cli.init_geo", "-s", str(src),
                          "-m", str(out), "--n_views", nv,
                          "--ckpt_path", args.ckpt_path, "--focal_avg",
                          "--co_vis_dsp", "--conf_aware_ranking"]
                    + (["--max_pts", str(args.max_pts)]
                       if args.max_pts else []) + shard,
                    logs / "01_init_geo.log", env=env, **watchdog)
            ok = ok and run_stage(
                py + ["instantsplat_tpu.cli.train", "-s", str(src),
                      "-m", str(out), "--n_views", nv, "--iterations", it,
                      "--pp_optimizer", "--optim_pose"] + shard,
                logs / "02_train.log", env=env, **watchdog)
            ok = ok and run_stage(
                py + ["instantsplat_tpu.cli.render", "-s", str(src),
                      "-m", str(out), "--n_views", nv, "--iteration", it,
                      "--skip_test"],
                logs / "03_render_train.log", env=env, **watchdog)
            ok = ok and run_stage(
                py + ["instantsplat_tpu.cli.render", "-s", str(src),
                      "-m", str(out), "--n_views", nv, "--iteration", it,
                      "--skip_train", "--eval", "--test_fps",
                      "--optim_test_pose_iter",
                      str(args.optim_test_pose_iter)] + shard,
                logs / "04_render_test.log", env=env, **watchdog)
            ok = ok and run_stage(
                py + ["instantsplat_tpu.cli.metrics", "-m", str(out),
                      "-s", str(src), "--n_views", nv],
                logs / "05_metrics.log", env=env, **watchdog)
            print(f"== {scene}: {'DONE' if ok else 'FAILED'} ==")
            return ok

        return run_scene

    results = schedule_scenes(
        [make_scene_fn(s) for s in args.scenes], args.jobs)
    n_ok = sum(bool(r) for r in results)
    print(f"== {n_ok}/{len(results)} scenes succeeded ==")
    sys.exit(0 if n_ok == len(results) else 1)


if __name__ == "__main__":
    main()
