"""Pre-training dataset loaders over the preprocessed reference layouts.

Each loader is exercised against a synthetic fixture materialized in the
EXACT on-disk format the reference's preprocess scripts produce
(dust3r/datasets/*.py); the batch contract (img/pts3d/valid_mask shapes,
world-point consistency across a pair) is checked uniformly. Also covers
the minimal EXR codec and the dataset arithmetic (easy_dataset.py).
"""

import numpy as np
import pytest

from instantsplat_tpu.train_dust3r import loaders as L


def _check_batches(ds, batch_size=2, n_expected_keys=("img1", "img2")):
    """Pull one batch and check the uniform contract: finite stacked maps,
    valid masks with coverage, and pair views seeing the SAME plane —
    reciprocal reprojection must find correspondences."""
    got = 0
    for b in ds.batches(batch_size=batch_size, seed=0):
        for k in n_expected_keys:
            assert k in b
        img1 = np.asarray(b["img1"])
        p1 = np.asarray(b["gt1"]["pts3d"])
        p2 = np.asarray(b["gt2"]["pts3d"])
        v1 = np.asarray(b["gt1"]["valid_mask"])
        assert img1.shape[0] == batch_size and img1.shape[-1] == 3
        assert p1.shape == img1.shape and np.isfinite(p1).all()
        assert v1.mean() > 0.5  # the synthetic plane fills the frame
        # both views unproject to the same world plane (z = 4 + offset)
        z1 = p1[..., 2][v1]
        assert np.allclose(z1, z1.mean(), atol=0.05)
        z2 = p2[..., 2][np.asarray(b["gt2"]["valid_mask"])]
        assert abs(z1.mean() - z2.mean()) < 0.05
        got += 1
        if got >= 2:
            break
    assert got >= 1
    return b


def test_exr_round_trip(tmp_path):
    from instantsplat_tpu.data.exr import read_exr, write_exr

    rng = np.random.default_rng(0)
    for comp in ("none", "zips", "zip"):
        img = (rng.random((17, 33)) * 50).astype(np.float32)
        p = tmp_path / f"d_{comp}.exr"
        write_exr(p, img, compression=comp)
        assert np.array_equal(read_exr(p), img), comp
    # half precision stores with ~2^-11 relative error
    img = (rng.random((16, 32)) * 50).astype(np.float32)
    write_exr(tmp_path / "h.exr", img, half=True)
    back = read_exr(tmp_path / "h.exr")
    assert back.dtype == np.float32
    assert np.abs(back - img).max() < img.max() * 2 ** -10
    # multi-channel comes back [H, W, C] in alphabetical channel order
    rgb = rng.random((9, 11, 3)).astype(np.float32)
    write_exr(tmp_path / "rgb.exr", rgb)
    back = read_exr(tmp_path / "rgb.exr")
    assert back.shape == (9, 11, 3)
    assert np.allclose(back[..., 2], rgb[..., 0])  # R sorts last


def test_co3d_loader(tmp_path):
    L.write_synthetic_co3d(tmp_path, n_views=8)
    ds = L.Co3d(ROOT=tmp_path, split="train", resolution=(32, 24))
    assert len(ds) == len(ds.combinations)
    b = _check_batches(ds)
    assert np.asarray(b["img1"]).shape[1:3] == (24, 32)
    # mask_bg='rand' and the invalidation retry path stay functional
    ds2 = L.Co3d(ROOT=tmp_path, split="train", mask_bg="rand",
                 resolution=(32, 24))
    v1, v2 = ds2._get_views(0, np.random.default_rng(0), (32, 24))
    assert v1["valid_mask"].any() and v2["valid_mask"].any()


def test_wildrgbd_loader(tmp_path):
    L.write_synthetic_wildrgbd(tmp_path, n_views=8)
    ds = L.WildRGBD(ROOT=tmp_path, split="train", resolution=(32, 24))
    _check_batches(ds)


def test_scannetpp_loader(tmp_path):
    L.write_synthetic_scannetpp(tmp_path, n_views=6)
    ds = L.ScanNetpp(ROOT=tmp_path, resolution=(32, 24))
    assert len(ds) == 5
    _check_batches(ds)
    with pytest.raises(Exception):
        L.ScanNetpp(ROOT=tmp_path, split="test")  # train-only dataset


def test_arkitscenes_loader(tmp_path):
    L.write_synthetic_arkitscenes(tmp_path, n_views=6)
    ds = L.ARKitScenes(ROOT=tmp_path, split="train", resolution=(32, 24))
    assert len(ds) == 5
    _check_batches(ds)


def test_blendedmvs_loader(tmp_path):
    L.write_synthetic_blendedmvs(tmp_path, n_views=6)
    ds = L.BlendedMVS(ROOT=tmp_path, resolution=(32, 24))
    assert len(ds) == 5
    _check_batches(ds)
    # split selection by seq_low % 10 (seq_low=1 => train)
    assert len(L.BlendedMVS(ROOT=tmp_path, split="train")) == 5
    assert len(L.BlendedMVS(ROOT=tmp_path, split="val")) == 0


def test_megadepth_loader(tmp_path):
    L.write_synthetic_megadepth(tmp_path, n_views=6)
    ds = L.MegaDepth(ROOT=tmp_path, resolution=(32, 24))
    assert len(ds) == 5
    _check_batches(ds)
    # scene 0001 is not in the val scenes (0015/0022) => train keeps all
    assert len(L.MegaDepth(ROOT=tmp_path, split="train")) == 5
    assert len(L.MegaDepth(ROOT=tmp_path, split="val")) == 0


def test_waymo_loader(tmp_path):
    L.write_synthetic_waymo(tmp_path, n_views=6)
    ds = L.Waymo(ROOT=tmp_path, resolution=(32, 24))
    assert len(ds) == 5
    _check_batches(ds)


def test_staticthings3d_loader(tmp_path):
    L.write_synthetic_staticthings3d(tmp_path, n_views=4)
    ds = L.StaticThings3D(ROOT=tmp_path, resolution=(32, 24))
    assert len(ds) == 3
    _check_batches(ds)


def test_habitat_loader(tmp_path):
    L.write_synthetic_habitat(tmp_path, size=1000, n_scenes=3)
    ds = L.Habitat(1000, ROOT=tmp_path, resolution=(32, 24))
    assert len(ds) == 3
    _check_batches(ds)


def test_dataset_arithmetic(tmp_path):
    """a + b concat, n @ a resize with per-epoch resample, n * a
    duplication (easy_dataset.py:11-21)."""
    L.write_synthetic_scannetpp(tmp_path / "a", n_views=6)
    L.write_synthetic_waymo(tmp_path / "b", n_views=6)
    a = L.ScanNetpp(ROOT=tmp_path / "a", resolution=(32, 24))
    b = L.Waymo(ROOT=tmp_path / "b", resolution=(32, 24))

    cat = a + b
    assert len(cat) == len(a) + len(b)
    # index routing reaches both children
    v = cat._get_views(len(a), np.random.default_rng(0), (32, 24))
    assert v[0]["img"].shape == (24, 32, 3)
    _check_batches(cat, batch_size=4)

    mul = 3 * a
    assert len(mul) == 3 * len(a)

    res = 7 @ a
    assert len(res) == 7
    res.set_epoch(0)
    i0 = res._idxs.copy()
    res.set_epoch(1)
    assert not np.array_equal(i0, res._idxs)  # per-epoch resample
    _check_batches(res, batch_size=2)

    # combined spec string (get_data_loader eval role)
    spec = (f"ScanNetpp(ROOT='{tmp_path / 'a'}', resolution=(32, 24)) + "
            f"4 @ Waymo(ROOT='{tmp_path / 'b'}', resolution=(32, 24))")
    ds = L.make_dataset(spec)
    assert len(ds) == len(a) + 4


def test_pretrain_cli_smoke(tmp_path):
    """The training launcher (reference dust3r/training.py:39-91) runs a
    few steps end-to-end from a dataset spec string, saves + auto-resumes
    its checkpoint."""
    from instantsplat_tpu.cli.pretrain import main

    L.write_synthetic_waymo(tmp_path / "w", n_views=6, h=32, w=32)
    out = tmp_path / "out"
    spec = f"Waymo(ROOT='{tmp_path / 'w'}', resolution=(32, 32))"
    argv = ["--train_dataset", spec, "--tiny", "--steps", "2",
            "--batch_size", "2", "--print_freq", "1", "--save_freq", "1",
            "--output_dir", str(out), "--warmup_steps", "1"]
    main(argv)
    assert (out / "checkpoint-last.npz").exists()
    main(argv)  # auto-resume path: step index restored, no crash


def test_train_loop_eval_and_keep_checkpoints(tmp_path):
    """The periodic test pass (training.py:154-172) and keep_freq
    snapshots (training.py:181-184): history gains test_loss entries and
    checkpoint-{step}.npz files appear alongside checkpoint-last."""
    from instantsplat_tpu.models import mast3r
    from instantsplat_tpu.train_dust3r.trainer import (
        synthetic_batch,
        train_loop,
    )

    cfg = mast3r.MASt3RConfig(
        enc_embed_dim=32, enc_depth=1, enc_num_heads=2, dec_embed_dim=32,
        dec_depth=1, dec_num_heads=2, dpt_layer_dims=(8, 8, 8, 8),
        dpt_feature_dim=8, dpt_last_dim=4, patch_size=16)
    params = mast3r.init_params(cfg, seed=0)
    train = [synthetic_batch(cfg, batch=2, h=16, w=16, seed=s)
             for s in range(4)]
    test = [synthetic_batch(cfg, batch=2, h=16, w=16, seed=100)]

    out = tmp_path / "out"
    _, history = train_loop(
        params, cfg, iter(train), n_steps=4, log_every=1,
        output_dir=str(out), save_every=10, keep_every=2,
        eval_batches=lambda: iter(test), eval_every=2,
        warmup_steps=1, total_steps=4)
    assert (out / "checkpoint-2.npz").exists()
    assert (out / "checkpoint-4.npz").exists()
    assert (out / "checkpoint-last.npz").exists()
    evals = [(s, m) for s, m in history if "test_loss" in m]
    assert [s for s, _ in evals] == [2, 4]  # every 2 steps; no dup at end
    assert all(np.isfinite(m["test_loss"]) for _, m in evals)


def test_loader_feeds_training_step(tmp_path):
    """A loader batch drives one DP pre-training step end-to-end."""
    import jax

    from instantsplat_tpu.models import mast3r
    from instantsplat_tpu.train_dust3r.trainer import make_dp_train_step

    L.write_synthetic_blendedmvs(tmp_path, n_views=4, h=32, w=32)
    ds = L.BlendedMVS(ROOT=tmp_path, resolution=(32, 32))
    batch = next(iter(ds.batches(batch_size=2, seed=0)))

    cfg = mast3r.MASt3RConfig(
        enc_embed_dim=32, enc_depth=1, enc_num_heads=2, dec_embed_dim=32,
        dec_depth=2, dec_num_heads=2, dpt_layer_dims=(8, 8, 8, 8),
        dpt_feature_dim=8, dpt_last_dim=4, patch_size=16)
    params = mast3r.init_params(cfg, seed=0)
    init_state, step, _shard = make_dp_train_step(cfg)
    state = init_state(params)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_batches_num_workers_and_prefetch(tmp_path):
    """num_workers > 1 loads views with a thread pool and prefetch_iter
    pipelines batches: same batch CONTRACT, deterministic per seed, and
    exceptions propagate."""
    from instantsplat_tpu.train_dust3r.datasets import prefetch_iter

    L.write_synthetic_co3d(tmp_path, n_views=8)
    ds = L.Co3d(ROOT=tmp_path, split="train", resolution=(32, 24))

    def take(gen, n=2):
        out = []
        for b in gen:
            out.append(b)
            if len(out) == n:
                break
        return out

    par1 = take(ds.batches(batch_size=2, seed=0, num_workers=4))
    par2 = take(ds.batches(batch_size=2, seed=0, num_workers=4))
    seq = take(ds.batches(batch_size=2, seed=0))
    # deterministic across runs at the same worker setting
    np.testing.assert_array_equal(np.asarray(par1[0]["img1"]),
                                  np.asarray(par2[0]["img1"]))
    # same contract as sequential
    assert np.asarray(par1[0]["img1"]).shape == \
        np.asarray(seq[0]["img1"]).shape
    assert np.isfinite(np.asarray(par1[0]["gt1"]["pts3d"])).all()

    pre = take(prefetch_iter(ds.batches(batch_size=2, seed=0,
                                        num_workers=4), depth=2))
    np.testing.assert_array_equal(np.asarray(pre[0]["img1"]),
                                  np.asarray(par1[0]["img1"]))

    def boom():
        yield {"x": 1}
        raise ValueError("producer failed")

    it = prefetch_iter(boom())
    assert next(it) == {"x": 1}
    with pytest.raises(ValueError, match="producer failed"):
        next(it)


def test_prefetch_iter_releases_producer_on_early_abandon():
    """Closing the prefetch iterator early (the train loop hit --steps)
    must stop the producer thread and close the wrapped generator (its
    finally releases the dataset's worker pool) instead of leaving the
    worker blocked forever on the full queue."""
    import threading
    import time

    from instantsplat_tpu.train_dust3r.datasets import prefetch_iter

    closed = threading.Event()

    def endless():
        try:
            i = 0
            while True:
                yield {"i": i}
                i += 1
        finally:
            closed.set()

    it = prefetch_iter(endless(), depth=2)
    assert next(it)["i"] == 0
    it.close()  # consumer abandons with the queue full
    deadline = time.time() + 5.0
    while not closed.is_set() and time.time() < deadline:
        time.sleep(0.02)
    assert closed.is_set(), "wrapped generator was never closed"
