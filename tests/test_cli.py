"""CLI drop-in compatibility: every flag combination the reference's run
scripts pass must parse (scripts/run_eval.sh:69-133, run_infer.sh, and the
reference entry-point parsers at init_geo.py:133-151, train.py:303-312,
render.py:256-262, metrics.py:135-137, init_test_pose.py:96-114).

Parsers only — no pipeline execution, no device work.
"""

from instantsplat_tpu.cli import (
    init_geo,
    init_test_pose,
    metrics,
    render,
    train,
)


def test_init_geo_run_eval_invocation():
    # run_eval.sh:69-76
    args = init_geo.build_parser().parse_args(
        ["-s", "/d/scene", "-m", "/o/model", "--n_views", "3",
         "--focal_avg", "--co_vis_dsp", "--conf_aware_ranking"])
    assert args.n_views == 3 and args.focal_avg and args.co_vis_dsp
    # reference-parser flags that its main() ignores must still parse
    args = init_geo.build_parser().parse_args(
        ["-s", "a", "-m", "b", "--min_conf_thr", "5", "--llffhold", "8",
         "--device", "cuda", "--image_size", "512", "--niter", "300",
         "--lr", "0.01", "--schedule", "cosine", "--depth_thre", "0.01",
         "--infer_video"])
    assert args.min_conf_thr == 5 and args.llffhold == 8


def test_train_run_eval_invocation():
    # run_eval.sh:81-89 (note -r 1: the reference ParamGroup auto-abbrev)
    args = train.build_parser().parse_args(
        ["-s", "/d/scene", "-m", "/o/model", "-r", "1", "--n_views", "3",
         "--iterations", "1000", "--pp_optimizer", "--optim_pose"])
    assert args.resolution == 1
    assert args.iterations == 1000
    assert args.pp_optimizer and args.optim_pose
    # optim_pose/pp_optimizer are store_true with reference defaults False
    base = train.build_parser().parse_args(["-s", "a", "-m", "b"])
    assert not base.optim_pose and not base.pp_optimizer
    # reference train.py:303-312 debug/viewer knobs parse
    args = train.build_parser().parse_args(
        ["-s", "a", "-m", "b", "--disable_viewer", "--debug_from", "100",
         "--detect_anomaly", "--quiet", "--ip", "0.0.0.0", "--port", "6",
         "--test_iterations", "100", "200", "--save_iterations", "1000",
         "--checkpoint_iterations", "500", "--start_checkpoint", "c.npz"])
    assert args.debug_from == 100 and args.test_iterations == [100, 200]


def test_render_run_eval_invocation():
    # run_eval.sh:103-123: --iterations spelling + -r 1 + --eval
    args = render.build_parser().parse_args(
        ["-s", "/d/scene", "-m", "/o/model", "-r", "1", "--n_views", "3",
         "--iterations", "1000", "--eval"])
    assert args.iteration == 1000 and args.eval
    # our canonical spelling keeps working
    args = render.build_parser().parse_args(
        ["-s", "a", "-m", "b", "--iteration", "7", "--skip_train",
         "--skip_test", "--infer_video", "--test_fps",
         "--optim_test_pose_iter", "250"])
    assert args.iteration == 7 and args.optim_test_pose_iter == 250


def test_metrics_run_eval_invocation():
    # run_eval.sh:128-133
    args = metrics.build_parser().parse_args(
        ["-m", "/o/model", "-s", "/d/scene", "--n_views", "3"])
    assert args.model_paths == ["/o/model"] and args.n_views == 3


def test_init_test_pose_reference_invocation():
    # run_eval.sh:93-101 (scripted-off stage) + full reference parser set
    args = init_test_pose.build_parser().parse_args(
        ["-s", "/d/scene", "-m", "/o/model", "--n_views", "3",
         "--focal_avg", "--min_conf_thr", "5", "--llffhold", "8",
         "--conf_aware_ranking", "--co_vis_dsp", "--depth_thre", "0.01",
         "--infer_video", "--device", "cuda"])
    assert args.focal_avg and args.n_views == 3
