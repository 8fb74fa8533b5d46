"""Stage 2: joint Gaussian + camera-pose training from a sparse_{n} scene.

Pipeline equivalent of the reference train.py:88-231 (see SURVEY.md §3.2):
reads the COLMAP-format scene init_geo wrote, builds the Gaussian model
from the fused point cloud (KNN scales), attaches learnable per-view poses,
runs the jitted joint optimization (pipelines/trainer.py), and writes the
reference's artifact set:

  <model>/point_cloud/iteration_{it}/point_cloud.ply   (3DGS ply)
  <model>/pose/ours_{it}/pose_org.npy                  (init w2c mats)
  <model>/pose/ours_{it}/pose_optimized.npy            (optimized w2c mats)
  <model>/cfg_args                                     (namespace dump)
  <model>/train_time.txt                               ('[2] train_joint')
  <model>/ckpt/...                                     (orbax-style npz)
"""

from __future__ import annotations

import dataclasses
import time
from argparse import Namespace
from pathlib import Path

import numpy as np

from instantsplat_tpu.data import ply, scene as scene_io
from instantsplat_tpu.models.gaussians import GaussianModel
from instantsplat_tpu.opt.gaussian_opt import (
    OptimizationConfig,
    confidence_to_lr,
)
from instantsplat_tpu.pipelines.config import ModelParams
from instantsplat_tpu.pipelines.trainer import TrainerConfig, train_joint
from instantsplat_tpu.utils import transforms as T


def poses_7_to_w2c(pose7):
    """[V,7] quat+trans params -> [V,4,4] w2c (reference save_pose,
    train.py:44-60 via get_camera_from_tensor). Host-side numpy
    (see transforms.matrix_to_pose_np docstring)."""
    return T.pose_to_matrix_np(np.asarray(pose7))


def save_checkpoint(path, params: GaussianModel, opt_state, iteration):
    """Full-state checkpoint (reference capture/restore + torch.save,
    gaussian_model.py:65-99, train.py:225-227) as a flat npz."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    flat = {"iteration": np.asarray(iteration)}
    for f in dataclasses.fields(GaussianModel):
        if f.metadata.get("static"):
            continue
        flat[f"p_{f.name}"] = np.asarray(getattr(params, f.name))
        flat[f"m_{f.name}"] = np.asarray(getattr(opt_state.m, f.name))
        flat[f"v_{f.name}"] = np.asarray(getattr(opt_state.v, f.name))
    flat["step"] = np.asarray(opt_state.step)
    if opt_state.per_point_lr is not None:
        flat["per_point_lr"] = np.asarray(opt_state.per_point_lr)
    flat["max_sh_degree"] = np.asarray(params.max_sh_degree)
    np.savez(path, **flat)


def load_checkpoint(path):
    """-> (params, AdamState, iteration)."""
    import jax.numpy as jnp

    from instantsplat_tpu.opt.gaussian_opt import AdamState

    z = np.load(path)
    d = int(z["max_sh_degree"])

    def build(prefix):
        kw = {
            f.name: jnp.asarray(z[f"{prefix}_{f.name}"])
            for f in dataclasses.fields(GaussianModel)
            if not f.metadata.get("static")
        }
        return GaussianModel(max_sh_degree=d, **kw)

    params = build("p")
    state = AdamState(
        m=build("m"),
        v=build("v"),
        step=jnp.asarray(z["step"]),
        per_point_lr=(jnp.asarray(z["per_point_lr"])
                      if "per_point_lr" in z else None),
    )
    return params, state, int(z["iteration"])


def run_training(
    model: ModelParams,
    opt: OptimizationConfig,
    trainer: TrainerConfig,
    save_iterations=None,
    checkpoint_iterations=(),
    progress_cb=None,
    start_checkpoint=None,
    testing_iterations=(),
    viewer=None,
):
    """Returns (params, history). Writes the reference artifact tree."""
    model_path = Path(model.model_path)
    model_path.mkdir(parents=True, exist_ok=True)
    save_iterations = sorted(set(
        [trainer.iterations] if save_iterations is None
        else list(save_iterations) + [trainer.iterations]))

    info = scene_io.read_scene(
        model.source_path, model.n_views, split="train",
        images_dir=model.images,
        resolution_scale=1.0 if model.resolution in (-1, 1)
        else float(model.resolution),
    )
    cam_poses = GaussianModel.init_cam_poses_from_w2c(info.poses_w2c)
    scale_override = None
    if model.init_scale_from_view_depth:
        # per-point scale from min view depth (scene/__init__.py:86-95)
        from instantsplat_tpu.utils.graphics import scale_from_view_depth

        focals = np.stack([
            [float(c.fx), float(c.fy)] for c in info.cameras])
        scale_override = scale_from_view_depth(
            info.points, info.poses_w2c, focals)
    params = GaussianModel.create_from_pcd(
        info.points, info.colors, cam_poses=cam_poses,
        max_sh_degree=model.sh_degree,
        scale_override=scale_override,
    )

    # per-point LR from MASt3R confidence (train.py:93-96)
    confidence_lr = None
    conf_path = (Path(model.source_path)
                 / f"sparse_{model.n_views}" / "0" / "confidence_dsp.npy")
    if opt.pp_optimizer and conf_path.exists():
        conf = np.load(conf_path).reshape(-1)
        if len(conf) == params.num_points:
            confidence_lr = np.asarray(confidence_to_lr(conf))

    # input.ply copy + cameras.json export (scene/__init__.py:53-65 +
    # utils/camera_utils.py:66-86 camera_to_JSON)
    import json as _json
    import shutil as _shutil

    if Path(info.ply_path).exists():
        _shutil.copyfile(info.ply_path, model_path / "input.ply")
    json_cams = []
    for cid, cam in enumerate(info.cameras):
        c2w = np.linalg.inv(info.poses_w2c[cid])
        json_cams.append({
            "id": cid,
            "img_name": Path(info.image_names[cid]).stem,
            "width": cam.width,
            "height": cam.height,
            "position": c2w[:3, 3].tolist(),
            "rotation": [row.tolist() for row in c2w[:3, :3]],
            "fx": float(cam.fx),
            "fy": float(cam.fy),
        })
    with open(model_path / "cameras.json", "w") as f:
        _json.dump(json_cams, f)

    # pose_org snapshot per save iteration (train.py:104-107)
    for it in save_iterations:
        pdir = model_path / "pose" / f"ours_{it}"
        pdir.mkdir(parents=True, exist_ok=True)
        np.save(pdir / "pose_org.npy", poses_7_to_w2c(params.cam_poses))

    # resume (reference train.py:101-103)
    opt_state0, first_iter = None, 0
    if start_checkpoint:
        params, opt_state0, first_iter = load_checkpoint(start_checkpoint)
        print(f"[train] resumed from {start_checkpoint} "
              f"at iteration {first_iter}")

    # observability: JSONL scalars + periodic validation sweep
    # (reference train.py:34-38, 256-295)
    from instantsplat_tpu.utils.logging import (
        ScalarLogger,
        make_eval_fn,
        training_report,
    )

    logger = ScalarLogger(model_path)
    params_ref = [params]
    eval_fn = make_eval_fn(
        params_ref, {"train": info.cameras}, backend=trainer.backend)

    def _cb(it, m):
        training_report(logger, it, m,
                        testing_iterations=testing_iterations,
                        eval_fn=eval_fn)
        if progress_cb is not None:
            progress_cb(it, m)

    t0 = time.time()
    params, opt_state, history = train_joint(
        params, info.cameras, opt_cfg=opt, trainer_cfg=trainer,
        spatial_lr_scale=info.nerf_radius,
        confidence_lr=confidence_lr,
        progress_cb=_cb,
        opt_state=opt_state0,
        first_iter=first_iter,
        live_ref=params_ref,
        viewer=viewer,
    )
    params_ref[0] = params
    logger.close()
    elapsed = time.time() - t0
    scene_io.save_time(model_path, "[2] train_joint", elapsed)

    for it in save_iterations:
        ply.save_gaussian_ply(
            model_path / "point_cloud" / f"iteration_{it}"
            / "point_cloud.ply", params)
        np.save(model_path / "pose" / f"ours_{it}" / "pose_optimized.npy",
                poses_7_to_w2c(params.cam_poses))
    for it in checkpoint_iterations:
        save_checkpoint(model_path / "ckpt" / f"chkpnt{it}.npz",
                        params, opt_state, it)

    # cfg_args for render/metrics (train.py:244-246)
    ns = Namespace(**{**dataclasses.asdict(model),
                      "n_views": model.n_views})
    from instantsplat_tpu.pipelines.config import save_cfg_args

    save_cfg_args(model_path, ns)
    return params, history


def load_trained(model_path, iteration, sh_degree=3, cam_poses=None):
    """Load a trained snapshot: (GaussianModel, iteration). Mirrors
    Scene(load_iteration=-1) + load_ply (scene/__init__.py:81-85)."""
    model_path = Path(model_path)
    if iteration == -1:
        its = [int(p.name.split("_")[1])
               for p in (model_path / "point_cloud").glob("iteration_*")]
        iteration = max(its)
    params = ply.load_gaussian_ply(
        model_path / "point_cloud" / f"iteration_{iteration}"
        / "point_cloud.ply", max_sh_degree=sh_degree, cam_poses=cam_poses)
    return params, iteration


# ---------------------------------------------------------------------------
# orbax checkpointing (sharded/async-capable backend for multi-host runs;
# the npz functions above remain the dependency-free default)
# ---------------------------------------------------------------------------


def save_checkpoint_orbax(path, params: GaussianModel, opt_state, iteration):
    """Orbax StandardCheckpointer save of the full training state. Unlike
    the npz writer this handles jax.sharding-distributed arrays (each host
    writes its shards) — the right backend once training runs on a pod
    slice."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    state = dict(
        params={f.name: getattr(params, f.name)
                for f in dataclasses.fields(GaussianModel)
                if not f.metadata.get("static")},
        m={f.name: getattr(opt_state.m, f.name)
           for f in dataclasses.fields(GaussianModel)
           if not f.metadata.get("static")},
        v={f.name: getattr(opt_state.v, f.name)
           for f in dataclasses.fields(GaussianModel)
           if not f.metadata.get("static")},
        step=opt_state.step,
        iteration=np.asarray(iteration),
        max_sh_degree=np.asarray(params.max_sh_degree),
    )
    if opt_state.per_point_lr is not None:
        state["per_point_lr"] = opt_state.per_point_lr
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state)


def load_checkpoint_orbax(path):
    """-> (params, AdamState, iteration)."""
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from instantsplat_tpu.opt.gaussian_opt import AdamState

    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(Path(path).absolute())
    d = int(state["max_sh_degree"])

    def build(tree):
        return GaussianModel(max_sh_degree=d, **{
            k: jnp.asarray(v) for k, v in tree.items()})

    opt_state = AdamState(
        m=build(state["m"]),
        v=build(state["v"]),
        step=jnp.asarray(state["step"]),
        per_point_lr=(jnp.asarray(state["per_point_lr"])
                      if "per_point_lr" in state else None),
    )
    return build(state["params"]), opt_state, int(state["iteration"])
