"""Stage-5 CLI: image + pose metrics.

Usage (mirrors reference metrics.py, scripts/run_eval.sh:129-133):

  python -m instantsplat_tpu.cli.metrics -m <out> -s <scene> --n_views 3
"""

from __future__ import annotations

from argparse import ArgumentParser

from instantsplat_tpu.pipelines.metrics_pipeline import run_metrics


def build_parser() -> ArgumentParser:
    parser = ArgumentParser(description="evaluate renders + poses")
    parser.add_argument("--model_paths", "-m", nargs="+", required=True)
    parser.add_argument("--source_path", "-s", type=str, default=None)
    parser.add_argument("--n_views", type=int, default=None)
    parser.add_argument("--no_pose", action="store_true")
    return parser


def main(argv=None):
    from instantsplat_tpu.parallel import initialize_runtime

    initialize_runtime()  # no-op single-process; wires jax.distributed on pods
    args = build_parser().parse_args(argv)

    results = run_metrics(
        args.model_paths,
        source_path=args.source_path,
        n_views=args.n_views,
        eval_pose=not args.no_pose,
    )
    for scene, methods in results.items():
        for method, vals in methods.items():
            print(f"[metrics] {scene} / {method}: {vals}")


if __name__ == "__main__":
    main()
