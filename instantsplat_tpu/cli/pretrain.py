"""Pre-training / fine-tuning CLI for the pointmap transformer.

The launcher role of the reference's `dust3r/training.py:39-91`
(get_args_parser) + `train.py` wrapper: build a (possibly combined)
dataset from a spec string, a loss from a criterion name, and run the
data-parallel jitted training loop (train_dust3r/trainer.py) with
auto-resume, bf16 mixed precision, and in-jit gradient accumulation.

  python -m instantsplat_tpu.cli.pretrain \
      --train_dataset "Co3d(ROOT='data/co3d', split='train', \
          resolution=[(512, 384)], aug_crop=16, transform='color_jitter') \
          + 10000 @ ScanNetpp(ROOT='data/scannetpp', ...)" \
      --criterion mast3r_finetune --steps 10000 --batch_size 8 \
      --bf16 --accum_iter 2 --output_dir out/ft

The dataset spec uses the same arithmetic as the reference's
--train_dataset string (`+` concat, `n @` resize — datasets/__init__.py:
20-22); loaders read the reference's preprocessed layouts
(train_dust3r/loaders.py) or the generic posed-RGBD directory format
(PosedMultiViewDataset(...)).
"""

from __future__ import annotations

from argparse import ArgumentParser

CRITERIA = {
    # ConfLoss(Regr3D(L21, norm_mode='avg_dis'), alpha=0.2) — the DUSt3R
    # pre-training default (training.py:45-46)
    "regr3d_conf": "regr3d_conf_loss",
    # + ConfMatchingLoss(MatchingLoss(InfoNCE)) — the MASt3R fine-tuning
    # objective (mast3r/losses.py:348-508); needs n_corres>0 datasets
    "mast3r_finetune": "mast3r_finetune_loss",
}


def main(argv=None):
    from instantsplat_tpu.parallel import initialize_runtime

    initialize_runtime()
    parser = ArgumentParser(description="pointmap model pre-training")
    parser.add_argument("--train_dataset", required=True,
                        help="dataset spec string (see module docstring)")
    parser.add_argument("--criterion", default="regr3d_conf",
                        choices=sorted(CRITERIA))
    parser.add_argument("--alpha", type=float, default=0.2,
                        help="conf-loss regularizer weight")
    parser.add_argument("--pretrained", default=None,
                        help="starting checkpoint (.pth torch file is "
                             "converted on load; .npz = this trainer's)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--num_workers", type=int, default=8,
                        help="data-loading threads (the reference torch "
                        "DataLoader num_workers, dust3r/training.py:74); "
                        "also enables 2-deep background batch prefetch. "
                        "0/1 = sequential in-line loading")
    parser.add_argument("--accum_iter", type=int, default=1)
    parser.add_argument("--steps", type=int, default=10_000,
                        help="optimizer steps (epoch x loader-len in the "
                             "reference; steps are the TPU-native unit)")
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--min_lr", type=float, default=1e-6)
    parser.add_argument("--warmup_steps", type=int, default=100)
    parser.add_argument("--weight_decay", type=float, default=0.05)
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 mixed precision (the reference's --amp)")
    parser.add_argument("--fsdp", action="store_true",
                        help="shard params + Adam moments over the data "
                             "axis (ZeRO-3-style; cuts optimizer HBM by "
                             "n_devices)")
    parser.add_argument("--output_dir", default=None,
                        help="checkpoint dir; auto-resumes from "
                             "checkpoint-last.npz when present")
    parser.add_argument("--save_freq", type=int, default=500,
                        help="steps between checkpoint-last saves")
    parser.add_argument("--keep_freq", type=int, default=0,
                        help="steps between immutable checkpoint-{step} "
                             "snapshots (reference keep_freq; 0 = off)")
    parser.add_argument("--test_dataset", default=None,
                        help="held-out dataset spec for the periodic "
                             "no-grad eval pass")
    parser.add_argument("--eval_freq", type=int, default=0,
                        help="steps between test passes (0 = end only)")
    parser.add_argument("--print_freq", type=int, default=20)
    parser.add_argument("--epochs", type=int, default=1,
                        help="passes over the dataset spec")
    parser.add_argument("--tiny", action="store_true",
                        help="tiny debug model instead of ViT-L (smoke "
                             "runs; no pretrained weights needed)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from instantsplat_tpu.models import mast3r
    from instantsplat_tpu.parallel import make_mesh
    from instantsplat_tpu.train_dust3r import losses as L
    from instantsplat_tpu.train_dust3r.loaders import make_dataset
    from instantsplat_tpu.train_dust3r.trainer import (
        stack_microbatches,
        train_loop,
    )

    if args.tiny:
        cfg = mast3r.MASt3RConfig(
            enc_embed_dim=64, enc_depth=2, enc_num_heads=2,
            dec_embed_dim=48, dec_depth=2, dec_num_heads=2,
            dpt_layer_dims=(8, 16, 24, 32), dpt_feature_dim=16,
            dpt_last_dim=8)
    else:
        cfg = mast3r.MASt3RConfig()
    if args.pretrained and args.pretrained.endswith(".pth"):
        params = mast3r.load_checkpoint(args.pretrained, cfg)
    else:
        params = mast3r.init_params(cfg, seed=args.seed)
        # .npz resume is handled by train_loop's auto-resume; an explicit
        # --pretrained .npz seeds params only (the checkpoint loader looks
        # leaves up by key path, so a params-only template skips the m/v
        # moment entries without materializing them)
        if args.pretrained:
            from instantsplat_tpu.train_dust3r.trainer import (
                load_pretrain_checkpoint,
            )

            params = load_pretrain_checkpoint(
                args.pretrained, dict(params=params))["params"]

    dataset = make_dataset(args.train_dataset)
    print(f"[pretrain] dataset: {dataset!r} ({len(dataset)} pairs)")

    # the DP step shards the batch's leading axis: the mesh size must
    # divide the per-step batch
    import math

    n_dev = math.gcd(len(jax.devices()), args.batch_size)
    mesh = make_mesh(n_dev) if n_dev > 1 else None
    if n_dev < len(jax.devices()):
        print(f"[pretrain] batch_size {args.batch_size} uses {n_dev} of "
              f"{len(jax.devices())} devices (DP shards the batch axis; "
              "pick batch_size % n_devices == 0 to use all)")
    if args.fsdp and mesh is None:
        print("[pretrain] --fsdp ignored: no device mesh "
              "(single device or batch_size 1)")

    def batches():
        it = dataset.batches(args.batch_size, seed=args.seed,
                             n_epochs=args.epochs,
                             num_workers=args.num_workers)
        if args.accum_iter > 1:
            def grouped(inner):
                while True:
                    group = [b for _, b in zip(range(args.accum_iter),
                                               inner)]
                    if len(group) < args.accum_iter:
                        return
                    yield stack_microbatches(group)

            it = grouped(it)
        if args.num_workers and args.num_workers > 1:
            # assemble ahead while the train step runs (DataLoader
            # worker pipelining)
            from instantsplat_tpu.train_dust3r.datasets import prefetch_iter

            it = prefetch_iter(it, depth=2)
        yield from it

    eval_batches = None
    if args.test_dataset:
        test_ds = make_dataset(args.test_dataset)

        def eval_batches():
            return test_ds.batches(args.batch_size, seed=args.seed + 1)

    loss_fn = getattr(L, CRITERIA[args.criterion])
    params, history = train_loop(
        params, cfg, batches(), mesh=mesh, n_steps=args.steps,
        log_every=args.print_freq, output_dir=args.output_dir,
        save_every=args.save_freq,
        keep_every=args.keep_freq or None,
        eval_batches=eval_batches,
        eval_every=args.eval_freq or None,
        base_lr=args.lr, min_lr=args.min_lr,
        warmup_steps=args.warmup_steps, total_steps=args.steps,
        weight_decay=args.weight_decay, loss_fn=loss_fn, alpha=args.alpha,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
        accum_iter=args.accum_iter,
        fsdp=args.fsdp and mesh is not None,
    )
    if history:
        trains = [(s, m) for s, m in history if "loss" in m]
        evals = [(s, m) for s, m in history if "test_loss" in m]
        msg = "[pretrain] done:"
        if trains:
            msg += f" step {trains[-1][0]} loss {trains[-1][1]['loss']:.4f}"
        if evals:
            msg += f" test_loss {evals[-1][1]['test_loss']:.4f}"
        print(msg)
    return params


if __name__ == "__main__":
    main()
