"""Stage-1 CLI: geometry initialization (MASt3R -> global alignment).

Usage (mirrors reference init_geo.py, scripts/run_eval.sh:70-77):

  python -m instantsplat_tpu.cli.init_geo -s <scene> -m <out> \
      --n_views 3 --ckpt_path <mast3r.pth> --focal_avg

Requires a MASt3R checkpoint for the pointmap model; in environments
without one the stage exits with an explanatory error (the rest of the
pipeline runs from any COLMAP-format scene, e.g. one produced by the
reference's init_geo).
"""

from __future__ import annotations

from argparse import ArgumentParser


def build_parser() -> ArgumentParser:
    parser = ArgumentParser(description="geometry initialization")
    parser.add_argument("--source_path", "-s", required=True)
    parser.add_argument("--model_path", "-m", required=True)
    parser.add_argument("--ckpt_path", type=str, default="")
    parser.add_argument("--n_views", type=int, default=3)
    parser.add_argument("--image_size", type=int, default=512)
    parser.add_argument("--niter", type=int, default=300)
    parser.add_argument("--lr", type=float, default=0.01)
    parser.add_argument("--schedule", type=str, default="cosine")
    parser.add_argument("--focal_avg", action="store_true")
    parser.add_argument("--conf_aware_ranking", action="store_true")
    parser.add_argument("--co_vis_dsp", action="store_true")
    parser.add_argument("--depth_thre", type=float, default=0.01)
    parser.add_argument("--max_pts", type=int, default=int(150e10),
                        help="confidence-weighted random downsample cap on "
                             "the fused cloud (reference sfm_utils.py:250 "
                             "max_pts_num)")
    parser.add_argument("--infer_video", action="store_true")
    # pair-decode batch: 24 measured near the per-chip MFU knee
    # (scripts/bench_mast3r.py); clamped to the scene's pair count
    parser.add_argument("--batch_size", type=int, default=24)
    # Stage-1 transformer precision: bf16 mixed precision (LayerNorm/
    # softmax statistics and head postprocess stay f32) is ~2x MXU
    # throughput on the pair sweep — the stage's hot loop (SURVEY §3.1);
    # pointmap deviation vs f32 is at bf16 mantissa level
    # (tests/test_mast3r.py:262).
    parser.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    # Multi-chip: pair-data-parallel MASt3R inference + edge-sharded
    # alignment over an n-device mesh. 0 = single-device, -1 = all local.
    parser.add_argument("--n_devices", type=int, default=0)
    # Accepted for drop-in compatibility with reference init_geo.py:137-144;
    # the reference accepts them but its main() never consumes them either
    # (split_train_test hardcodes the 12-index split, the aligner keeps its
    # default conf threshold) — documented no-ops here too.
    parser.add_argument("--min_conf_thr", type=float, default=5)
    parser.add_argument("--llffhold", type=int, default=8)
    parser.add_argument("--device", type=str, default="tpu")
    return parser


def main(argv=None):
    from instantsplat_tpu.parallel import initialize_runtime

    initialize_runtime()  # no-op single-process; wires jax.distributed on pods
    args = build_parser().parse_args(argv)

    mesh = None
    if args.n_devices:
        import jax

        from instantsplat_tpu.parallel.sharding import make_mesh

        ndev = (len(jax.devices()) if args.n_devices == -1
                else args.n_devices)
        if ndev > 1:
            mesh = make_mesh(ndev)
            print(f"[init_geo] pair-DP inference + edge-sharded alignment "
                  f"over {ndev} devices")

    import jax.numpy as jnp

    from instantsplat_tpu.models.mast3r_infer import make_pointmap_fn

    pointmap_fn = make_pointmap_fn(
        args.ckpt_path, batch_size=args.batch_size, mesh=mesh,
        dtype=jnp.bfloat16 if args.dtype == "bf16" else None)

    from instantsplat_tpu.pipelines.init_geo_pipeline import run_init_geo

    run_init_geo(
        args.source_path, args.model_path, pointmap_fn,
        n_views=args.n_views, image_size=args.image_size,
        niter=args.niter, lr=args.lr, schedule=args.schedule,
        focal_avg=args.focal_avg,
        conf_aware_ranking=args.conf_aware_ranking,
        depth_thre=args.depth_thre, co_vis_dsp=args.co_vis_dsp,
        max_pts=args.max_pts,
        infer_video=args.infer_video, save_all_pts=True,
        mesh=mesh,
    )
    print(f"[init_geo] done -> {args.source_path}/sparse_{args.n_views}")


if __name__ == "__main__":
    main()
