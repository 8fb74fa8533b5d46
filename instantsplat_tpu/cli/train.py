"""Stage-2 CLI: joint Gaussian + pose training.

Usage (mirrors reference train.py flags, scripts/run_eval.sh:82-90):

  python -m instantsplat_tpu.cli.train -s <scene> -m <out> --n_views 3 \
      --iterations 1000 --pp_optimizer --optim_pose
"""

from __future__ import annotations

from argparse import ArgumentParser

from instantsplat_tpu.pipelines import config as C
from instantsplat_tpu.pipelines.train_pipeline import run_training
from instantsplat_tpu.pipelines.trainer import TrainerConfig


def build_parser() -> ArgumentParser:
    parser = ArgumentParser(description="joint Gaussian+pose training")
    C.add_group(parser, C.ModelParams,
                abbrevs={"source_path": "s", "model_path": "m",
                         "images": "i", "resolution": "r",
                         "white_background": "w"})
    C.add_group(parser, C.PipelineParams)
    C.add_opt_group(parser)
    parser.add_argument("--save_iterations", nargs="+", type=int, default=[])
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int,
                        default=[])
    parser.add_argument("--test_iterations", nargs="+", type=int, default=[])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    # Multi-chip: shard every render over an n-device mesh
    # (parallel/sharding.py). 0 = single-device, -1 = all local devices.
    parser.add_argument("--n_devices", type=int, default=0)
    parser.add_argument("--shard_axis", choices=["pixels", "gaussians"],
                        default="pixels")
    # SIBR viewer wiring (reference train.py:310: --disable_viewer defaults
    # to True; pass --enable_viewer to serve live renders on --port)
    parser.add_argument("--enable_viewer", action="store_true")
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--quiet", action="store_true")
    # Reference-compat no-ops (train.py:305-310): --disable_viewer defaults
    # True upstream (the flag can't turn the viewer ON; --enable_viewer is
    # the meaningful switch here); torch-only debug knobs are accepted and
    # ignored — XLA has no per-iteration anomaly mode.
    parser.add_argument("--disable_viewer", action="store_true", default=True)
    parser.add_argument("--debug_from", type=int, default=-1)
    parser.add_argument("--detect_anomaly", action="store_true")
    return parser


def main(argv=None):
    from instantsplat_tpu.parallel import initialize_runtime

    initialize_runtime()  # no-op single-process; wires jax.distributed on pods
    args = build_parser().parse_args(argv)

    model = C.extract_group(args, C.ModelParams)
    opt = C.make_opt_config(args)
    trainer = TrainerConfig(
        iterations=args.iterations,
        white_background=model.white_background,
        backend=args.backend,
        n_devices=args.n_devices or None,
        shard_axis=args.shard_axis,
    )

    def progress(it, m):
        if not args.quiet:
            print(f"[train] iter {it}: loss={m['loss']:.5f} "
                  f"psnr={m['psnr']:.2f}", flush=True)

    viewer = None
    if args.enable_viewer:
        from instantsplat_tpu.render.network_gui import NetworkGUI

        viewer = NetworkGUI()
        viewer.init(args.ip, args.port)
        print(f"[train] viewer listening on {args.ip}:{args.port}")

    run_training(
        model, opt, trainer,
        save_iterations=args.save_iterations or None,
        checkpoint_iterations=args.checkpoint_iterations,
        progress_cb=progress,
        start_checkpoint=args.start_checkpoint,
        testing_iterations=args.test_iterations,
        viewer=viewer,
    )
    if viewer is not None:
        viewer.close()
    print(f"[train] done -> {model.model_path}")


if __name__ == "__main__":
    main()
