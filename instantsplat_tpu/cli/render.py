"""Stage-3/4 CLI: render train/test/interpolated views.

Usage (mirrors reference render.py, scripts/run_eval.sh:105-123):

  python -m instantsplat_tpu.cli.render -s <scene> -m <out> --n_views 3 \
      --iteration 1000 [--skip_train] [--skip_test] [--infer_video]
"""

from __future__ import annotations

from argparse import ArgumentParser

from instantsplat_tpu.pipelines import config as C
from instantsplat_tpu.pipelines.render_pipeline import run_render


def build_parser() -> ArgumentParser:
    parser = ArgumentParser(description="render trained scene")
    C.add_group(parser, C.ModelParams,
                abbrevs={"source_path": "s", "model_path": "m",
                         "images": "i", "resolution": "r",
                         "white_background": "w"})
    C.add_group(parser, C.PipelineParams)
    # reference render.py:256 spells the flag --iterations; accept both
    parser.add_argument("--iteration", "--iterations", dest="iteration",
                        type=int, default=-1)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--infer_video", action="store_true")
    parser.add_argument("--optim_test_pose_iter", type=int, default=500)
    parser.add_argument("--test_fps", action="store_true")
    # Multi-chip: views-data-parallel test-time pose refinement
    # (0 = single-device, -1 = all local devices)
    parser.add_argument("--n_devices", type=int, default=0)
    return parser


def main(argv=None):
    from instantsplat_tpu.parallel import initialize_runtime

    initialize_runtime()  # no-op single-process; wires jax.distributed on pods
    args = C.get_combined_args(build_parser(), argv)

    model = C.extract_group(args, C.ModelParams)
    mesh = None
    if getattr(args, "n_devices", 0):
        import jax

        from instantsplat_tpu.parallel.sharding import make_mesh

        ndev = (len(jax.devices()) if args.n_devices == -1
                else args.n_devices)
        if ndev > 1:
            mesh = make_mesh(ndev)
            print(f"[render] views-DP pose refinement over {ndev} devices")
    it = run_render(
        model,
        iteration=args.iteration,
        skip_train=args.skip_train,
        skip_test=args.skip_test,
        infer_video=args.infer_video,
        optim_test_pose_iter=args.optim_test_pose_iter,
        test_fps=args.test_fps,
        backend=args.backend,
        mesh=mesh,
    )
    print(f"[render] done (iteration {it}) -> {model.model_path}")


if __name__ == "__main__":
    main()
