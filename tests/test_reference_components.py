"""Component-level numeric parity against the ACTUAL reference code.

Each test runs a reference function (imported from /root/reference via
tests/reference_oracle.py — torch/numpy, CPU) and this repo's equivalent
on identical inputs and asserts the outputs match. Together with
test_reference_parity.py (global aligner) and test_golden.py (rasterizer
goldens), this removes the "our oracle and our kernels could drift
together" failure mode for every numeric subsystem the reference itself
can execute in this environment (the CUDA rasterizer submodules are empty
in the snapshot, so the render path is covered by goldens instead).

Reference citations are per-test. Skipped wholesale if /root/reference
is absent.
"""

from __future__ import annotations

import numpy as np
import pytest

from reference_oracle import (
    load_reference_module,
    reference_available,
    torch_cuda_to_cpu,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference not available")


def _rng(seed=0):
    return np.random.default_rng(seed)


# ---------------------------------------------------------------------------
# losses: utils/loss_utils.py + utils/image_utils.py
# ---------------------------------------------------------------------------


def test_ssim_matches_reference():
    """ops/ssim.ssim vs utils/loss_utils.py:65-85 (the torch ssim the
    training objective uses when fused-ssim is absent, train.py:40-43)."""
    import torch

    from instantsplat_tpu.ops.ssim import ssim

    lu = load_reference_module("utils.loss_utils")
    r = _rng(1)
    a = r.random((3, 24, 40), dtype=np.float32)
    b = np.clip(a + 0.1 * r.standard_normal((3, 24, 40)).astype(np.float32),
                0, 1)
    ref = float(lu.ssim(torch.tensor(a)[None], torch.tensor(b)[None]))
    ours = float(ssim(a, b))
    assert abs(ref - ours) < 1e-5, (ref, ours)


def test_l1_l2_masked_l1_match_reference():
    """ops/losses l1/l2/masked_l1 vs utils/loss_utils.py:20-23,40-47;
    the mask shape matches the reference call site (render.py:139-140:
    per-channel (rendering > 0) mask)."""
    import torch

    from instantsplat_tpu.ops import losses

    lu = load_reference_module("utils.loss_utils")
    r = _rng(2)
    a = r.random((3, 16, 24), dtype=np.float32)
    b = r.random((3, 16, 24), dtype=np.float32)
    mask = (a > 0.3).astype(np.float32)

    ta, tb, tm = map(torch.tensor, (a, b, mask))
    assert abs(float(lu.l1_loss(ta, tb)) - float(losses.l1_loss(a, b))) < 1e-6
    assert abs(float(lu.l2_loss(ta, tb)) - float(losses.l2_loss(a, b))) < 1e-6
    ref = float(lu.l1_loss_mask(ta, tb, tm))
    # ours takes [H, W, C] layouts; the mask matches pred's shape
    ours = float(losses.masked_l1_loss(
        a.transpose(1, 2, 0), b.transpose(1, 2, 0), mask.transpose(1, 2, 0)))
    assert abs(ref - ours) < 1e-6, (ref, ours)


def test_psnr_matches_reference():
    """ops/losses.psnr vs utils/image_utils.py:14-19."""
    import torch

    from instantsplat_tpu.ops.losses import psnr

    iu = load_reference_module("utils.image_utils")
    r = _rng(3)
    a = r.random((3, 16, 24), dtype=np.float32)
    b = r.random((3, 16, 24), dtype=np.float32)
    ref = float(iu.psnr(torch.tensor(a)[None], torch.tensor(b)[None]))
    ours = float(psnr(a.transpose(1, 2, 0), b.transpose(1, 2, 0)))
    assert abs(ref - ours) < 1e-4, (ref, ours)


# ---------------------------------------------------------------------------
# spherical harmonics: utils/sh_utils.py
# ---------------------------------------------------------------------------


def test_eval_sh_matches_reference():
    """utils/sh.eval_sh vs utils/sh_utils.py:57-112 for every degree 0..4.

    Layout note: the reference takes sh[..., C, K]; ours takes [..., K, C]."""
    import torch

    from instantsplat_tpu.utils import sh as SH

    su = load_reference_module("utils.sh_utils")
    r = _rng(4)
    n = 64
    dirs = r.standard_normal((n, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = dirs.astype(np.float32)
    for deg in range(5):
        k = (deg + 1) ** 2
        coeffs = r.standard_normal((n, 3, k)).astype(np.float32)
        ref = su.eval_sh(deg, torch.tensor(coeffs),
                         torch.tensor(dirs)).numpy()
        ours = np.asarray(SH.eval_sh(deg, coeffs.transpose(0, 2, 1), dirs))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)
    # RGB <-> SH DC conversions (sh_utils.py:114-118)
    rgb = r.random((5, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(SH.rgb_to_sh(rgb)), su.RGB2SH(torch.tensor(rgb)).numpy(),
        rtol=1e-6)


# ---------------------------------------------------------------------------
# graphics: utils/graphics_utils.py
# ---------------------------------------------------------------------------


def test_world2view_matches_reference():
    """utils/graphics.get_world2view2 vs graphics_utils.py:38-49."""
    from instantsplat_tpu.utils import transforms as T
    from instantsplat_tpu.utils.graphics import get_world2view2

    gu = load_reference_module("utils.graphics_utils")
    r = _rng(5)
    q = r.standard_normal(4)
    R = np.asarray(T.quat_to_rotmat(
        (q / np.linalg.norm(q)).astype(np.float32)))
    t = r.standard_normal(3).astype(np.float32)
    # the reference stores R transposed (c2w rotation) — same convention here
    ref = gu.getWorld2View2(R.T, t, translate=np.array([0.1, -0.2, 0.3]),
                            scale=1.7)
    ours = get_world2view2(R.T, t, translate=np.array([0.1, -0.2, 0.3]),
                           scale=1.7)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_projection_matrix_matches_reference():
    """utils/graphics.get_projection_matrix vs graphics_utils.py:71-91."""
    from instantsplat_tpu.utils.graphics import get_projection_matrix

    gu = load_reference_module("utils.graphics_utils")
    ref = gu.getProjectionMatrix(0.01, 100.0, 1.2, 0.9).numpy()
    ours = get_projection_matrix(0.01, 100.0, 1.2, 0.9)
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)
    # focal/fov conversions (graphics_utils.py:93-97)
    assert abs(gu.fov2focal(1.1, 640) -
               640 / (2 * np.tan(1.1 / 2))) < 1e-9
    assert abs(gu.focal2fov(gu.fov2focal(1.1, 640), 640) - 1.1) < 1e-9


# ---------------------------------------------------------------------------
# general utils: LR schedule, quaternion builds, covariance
# ---------------------------------------------------------------------------


def test_expon_lr_matches_reference():
    """utils/schedules.expon_lr vs general_utils.py:29-62 (the scheduler
    driving every param group, scene/gaussian_model.py setup)."""
    from instantsplat_tpu.utils.schedules import expon_lr

    gu = load_reference_module("utils.general_utils")
    for kwargs in (
        dict(lr_init=1.6e-4, lr_final=1.6e-6, max_steps=30_000),
        dict(lr_init=1e-3, lr_final=1e-5, lr_delay_steps=500,
             lr_delay_mult=0.01, max_steps=1000),
        dict(lr_init=0.0, lr_final=0.0, max_steps=100),
    ):
        ref_fn = gu.get_expon_lr_func(**kwargs)
        our_fn = expon_lr(**kwargs)
        for step in (-5, 0, 1, 250, 500, 999, 1000, 30_000, 50_000):
            assert abs(float(ref_fn(step)) - float(our_fn(step))) < 1e-9, (
                kwargs, step)


def test_build_rotation_and_covariance_match_reference():
    """transforms.quat_to_rotmat vs general_utils.py:78-99 build_rotation
    (wxyz), and the (R S)(R S)^T covariance (models/gaussians.get_covariance)
    vs build_scaling_rotation + strip_symmetric
    (scene/gaussian_model.py:40-42)."""
    import torch

    from instantsplat_tpu.utils import transforms as T

    gu = load_reference_module("utils.general_utils")
    r = _rng(6)
    q = r.standard_normal((32, 4)).astype(np.float32)
    s = np.exp(r.standard_normal((32, 3)).astype(np.float32) - 2)

    with torch_cuda_to_cpu():
        ref_R = gu.build_rotation(torch.tensor(q)).numpy()
        L = gu.build_scaling_rotation(torch.tensor(s), torch.tensor(q))
        ref_cov = (L @ L.transpose(1, 2)).numpy()

    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    our_R = np.asarray(T.quat_to_rotmat(qn.astype(np.float32)))
    np.testing.assert_allclose(our_R, ref_R, rtol=1e-5, atol=1e-6)

    our_L = our_R * s[:, None, :]
    our_cov = our_L @ np.swapaxes(our_L, -1, -2)
    np.testing.assert_allclose(our_cov, ref_cov, rtol=1e-4, atol=1e-6)

    # inverse_sigmoid (general_utils.py:18-19) vs the opacity init we use
    x = np.clip(r.random(16).astype(np.float32), 1e-4, 1 - 1e-4)
    ref_inv = gu.inverse_sigmoid(torch.tensor(x)).numpy()
    np.testing.assert_allclose(np.log(x / (1 - x)), ref_inv, rtol=1e-5)


# ---------------------------------------------------------------------------
# pose tensor conventions: utils/pose_utils.py
# ---------------------------------------------------------------------------


def test_pose_tensor_conversions_match_reference():
    """transforms.matrix_to_pose_np / pose_to_matrix_np vs
    pose_utils.py:57-84 get_camera_from_tensor + :183-216
    get_tensor_from_camera ([quat wxyz, trans] over w2c matrices — the
    camera-pose parameterization the whole training loop optimizes)."""
    import torch

    from instantsplat_tpu.utils import transforms as T

    pu = load_reference_module("utils.pose_utils")
    r = _rng(7)
    q = r.standard_normal(4)
    q /= np.linalg.norm(q)
    M = np.eye(4, dtype=np.float32)
    M[:3, :3] = np.asarray(T.quat_to_rotmat(q.astype(np.float32)))
    M[:3, 3] = r.standard_normal(3).astype(np.float32)

    ref_pose = pu.get_tensor_from_camera(torch.tensor(M)).numpy()
    our_pose = T.matrix_to_pose_np(M)
    # quaternions are sign-ambiguous; compare through the rotation they build
    np.testing.assert_allclose(our_pose[4:], ref_pose[4:], atol=1e-6)
    ref_M = pu.get_camera_from_tensor(
        torch.tensor(ref_pose, dtype=torch.float32)).numpy()
    our_M = T.pose_to_matrix_np(our_pose)
    np.testing.assert_allclose(our_M, ref_M, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(our_M, M, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# trajectory metrics: utils/utils_poses/
# ---------------------------------------------------------------------------


def _noisy_trajectories(n=8, seed=8):
    from instantsplat_tpu.utils import transforms as T

    r = _rng(seed)
    gt = []
    est = []
    for i in range(n):
        q = r.standard_normal(4)
        q /= np.linalg.norm(q)
        M = np.eye(4)
        M[:3, :3] = np.asarray(T.quat_to_rotmat(q.astype(np.float32)))
        M[:3, 3] = r.standard_normal(3)
        gt.append(M)
        dq = q + 0.02 * r.standard_normal(4)
        dq /= np.linalg.norm(dq)
        E = np.eye(4)
        E[:3, :3] = np.asarray(T.quat_to_rotmat(dq.astype(np.float32)))
        E[:3, 3] = M[:3, 3] + 0.05 * r.standard_normal(3)
        est.append(E)
    return np.stack(gt), np.stack(est)


def test_ate_rpe_match_reference():
    """eval/pose_metrics.compute_ate/compute_rpe vs
    utils/utils_poses/comp_ate.py:40-80 on identical trajectories."""
    from instantsplat_tpu.eval import pose_metrics as pm

    ca = load_reference_module("utils.utils_poses.comp_ate")
    gt, est = _noisy_trajectories()
    ref_ate = ca.compute_ATE(gt, est)
    our_ate = pm.compute_ate(gt, est)
    assert abs(ref_ate - our_ate) < 1e-9, (ref_ate, our_ate)
    ref_t, ref_r = ca.compute_rpe(gt, est)
    our_t, our_r = pm.compute_rpe(gt, est)
    assert abs(ref_t - our_t) < 1e-9
    assert abs(ref_r - our_r) < 1e-9


def test_sim3_trajectory_alignment_matches_reference():
    """eval/pose_metrics.align_ate_c2b_use_a2b vs
    utils/utils_poses/align_traj.py:34-77 (method='sim3') — the alignment
    metrics.py:98-118 applies before computing ATE."""
    import torch

    from instantsplat_tpu.eval import pose_metrics as pm

    at = load_reference_module("utils.utils_poses.align_traj")
    gt, est = _noisy_trajectories(seed=9)
    # scramble the estimate with a global sim3 so alignment does real work
    s = 2.3
    Rg = np.asarray(
        load_reference_module("utils.utils_poses.ATE.transformations")
        .rotation_matrix(0.7, [0.2, 0.5, -0.8]))[:3, :3]
    est2 = est.copy()
    est2[:, :3, :3] = Rg[None] @ est[:, :3, :3]
    est2[:, :3, 3] = s * (est[:, :3, 3] @ Rg.T) + np.array([1.0, -2.0, 0.5])

    ref = at.align_ate_c2b_use_a2b(
        torch.tensor(est2, dtype=torch.float32),
        torch.tensor(gt, dtype=torch.float32)).numpy()
    ours = pm.align_ate_c2b_use_a2b(est2, gt)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# camera paths: utils/camera_utils.py + utils/pose_utils.py
# ---------------------------------------------------------------------------


def _keyframe_poses(n=4, seed=13):
    """Camera c2w keyframes on an arc looking roughly at the origin."""
    r = _rng(seed)
    poses = []
    for i in range(n):
        ang = 0.4 * i
        pos = np.array([2.0 * np.sin(ang), 0.3 * i, 2.0 * np.cos(ang)])
        pos += 0.05 * r.standard_normal(3)
        fwd = -pos / np.linalg.norm(pos)
        right = np.cross(np.array([0.0, 1.0, 0.0]), fwd)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        poses.append(np.concatenate(
            [np.stack([right, up, fwd], 1), pos[:, None]], axis=1))
    return np.stack(poses)


def test_interpolated_path_matches_reference():
    """utils/camera_paths.generate_interpolated_path vs
    utils/camera_utils.py:127-182 — the B-spline every pipeline stage uses
    for test-pose pre-init (init_geo.py:94) and video paths (render.py:43)."""
    from instantsplat_tpu.utils.camera_paths import generate_interpolated_path

    cu = load_reference_module("utils.camera_utils")
    poses = _keyframe_poses()
    ref = cu.generate_interpolated_path(poses, n_interp=10)
    ours = generate_interpolated_path(poses, 10)
    assert ref.shape == ours.shape == (30, 3, 4)
    np.testing.assert_allclose(ours, ref, rtol=1e-7, atol=1e-9)
    # the 2-keyframe segments the call sites actually use (init_geo.py:94)
    ref2 = cu.generate_interpolated_path(poses[1:3], n_interp=24)
    ours2 = generate_interpolated_path(poses[1:3], 24)
    np.testing.assert_allclose(ours2, ref2, rtol=1e-7, atol=1e-9)


def test_transform_poses_pca_matches_reference():
    """utils/camera_paths.transform_poses_pca + focus_point_fn vs
    utils/pose_utils.py:239-292 (the normalization the ellipse render path
    applies, pose_utils.py:310-312)."""
    from instantsplat_tpu.utils import camera_paths as cp

    pu = load_reference_module("utils.pose_utils")
    poses = _keyframe_poses(n=6, seed=14)
    ref_p, ref_t = pu.transform_poses_pca(poses)
    our_p, our_t = cp.transform_poses_pca(poses)
    np.testing.assert_allclose(our_p, ref_p, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(our_t, ref_t, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(
        cp.focus_point_fn(poses), pu.focus_point_fn(poses),
        rtol=1e-8, atol=1e-10)


# ---------------------------------------------------------------------------
# stepfun sampling: utils/stepfun.py
# ---------------------------------------------------------------------------


def test_stepfun_sample_np_matches_reference():
    """utils/stepfun.sample_np vs reference utils/stepfun.py:221-249
    (deterministic paths; backs the interpolated-pose spline resampling in
    utils/pose_utils.py:6)."""
    from instantsplat_tpu.utils import stepfun as sf

    ref_sf = load_reference_module("utils.stepfun")
    r = _rng(10)
    t = np.sort(r.random(9)).astype(np.float64)
    w_logits = r.standard_normal(8).astype(np.float64)
    for det_center in (False, True):
        ref = ref_sf.sample_np(None, t, w_logits, 16,
                               deterministic_center=det_center)
        ours = sf.sample_np(None, t, w_logits, 16,
                            deterministic_center=det_center)
        np.testing.assert_allclose(np.asarray(ours).reshape(-1),
                                   np.asarray(ref).reshape(-1),
                                   rtol=1e-6, atol=1e-9)


# ---------------------------------------------------------------------------
# COLMAP binary model I/O: scene/colmap_loader.py
# ---------------------------------------------------------------------------


def test_colmap_binary_cross_roundtrip(tmp_path):
    """Bidirectional wire-format parity with scene/colmap_loader.py:
    our writers -> reference readers, reference writers -> our readers,
    for cameras.bin / images.bin / points3D.bin."""
    from instantsplat_tpu.data import colmap as C

    cl = load_reference_module("scene.colmap_loader")
    r = _rng(11)

    # --- ours write, reference read -------------------------------------
    cams = {1: C.ColmapCamera(id=1, model="PINHOLE", width=640, height=480,
                              params=np.array([500.0, 510.0, 320.0, 240.0]))}
    q = r.standard_normal(4)
    q /= np.linalg.norm(q)
    imgs = {
        7: C.ColmapImage(
            id=7, qvec=q.copy(), tvec=r.standard_normal(3), camera_id=1,
            name="view7.png",
            xys=r.random((5, 2)) * 100,
            point3D_ids=np.array([3, -1, 8, 2, -1], np.int64)),
    }
    xyz = r.standard_normal((6, 3))
    rgb = (r.random((6, 3)) * 255).astype(np.uint8)
    err = r.random((6,))

    C.write_cameras_binary(cams, tmp_path / "cameras.bin")
    C.write_images_binary(imgs, tmp_path / "images.bin")
    C.write_points3d_binary(tmp_path / "points3D.bin", xyz, rgb, err)

    ref_cams = cl.read_intrinsics_binary(str(tmp_path / "cameras.bin"))
    assert ref_cams[1].model == "PINHOLE"
    assert (ref_cams[1].width, ref_cams[1].height) == (640, 480)
    np.testing.assert_allclose(ref_cams[1].params, cams[1].params)

    ref_imgs = cl.read_extrinsics_binary(str(tmp_path / "images.bin"))
    assert ref_imgs[7].name == "view7.png"
    assert ref_imgs[7].camera_id == 1
    np.testing.assert_allclose(ref_imgs[7].qvec, q, atol=1e-12)
    np.testing.assert_allclose(ref_imgs[7].tvec, imgs[7].tvec, atol=1e-12)
    np.testing.assert_allclose(ref_imgs[7].xys, imgs[7].xys, atol=1e-12)
    np.testing.assert_array_equal(ref_imgs[7].point3D_ids,
                                  imgs[7].point3D_ids)

    ref_xyz, ref_rgb, ref_err = cl.read_points3D_binary(
        str(tmp_path / "points3D.bin"))
    np.testing.assert_allclose(ref_xyz, xyz, atol=1e-12)
    np.testing.assert_array_equal(ref_rgb, rgb)
    np.testing.assert_allclose(ref_err.reshape(-1), err, atol=1e-12)

    # --- reference write, ours read -------------------------------------
    ref_cam = cl.Camera(id=2, model="PINHOLE", width=320, height=200,
                        params=np.array([111.0, 112.0, 160.0, 100.0]))
    cl.write_cameras_binary({2: ref_cam}, str(tmp_path / "cameras2.bin"))
    ours_cams = C.read_cameras_binary(tmp_path / "cameras2.bin")
    assert ours_cams[2].model == "PINHOLE"
    np.testing.assert_allclose(ours_cams[2].params, ref_cam.params)

    ref_img = cl.Image(
        id=3, qvec=q.copy(), tvec=np.array([0.5, -1.0, 2.0]), camera_id=2,
        name="ref.png", xys=r.random((2, 2)),
        point3D_ids=np.array([4, -1], np.int64))
    cl.write_images_binary({3: ref_img}, str(tmp_path / "images2.bin"))
    ours_imgs = C.read_images_binary(tmp_path / "images2.bin")
    assert ours_imgs[3].name == "ref.png"
    np.testing.assert_allclose(ours_imgs[3].qvec, q, atol=1e-12)
    np.testing.assert_allclose(ours_imgs[3].tvec, ref_img.tvec, atol=1e-12)

    pts = {
        10: cl.Point3D(id=10, xyz=np.array([1.0, 2.0, 3.0]),
                       rgb=np.array([10, 20, 30], np.uint8), error=0.25,
                       image_ids=np.array([3]),
                       point2D_idxs=np.array([0])),
    }
    cl.write_points3D_binary(pts, str(tmp_path / "points3D2.bin"))
    o_xyz, o_rgb, o_err = C.read_points3d_binary(tmp_path / "points3D2.bin")
    np.testing.assert_allclose(o_xyz[0], pts[10].xyz)
    np.testing.assert_array_equal(o_rgb[0], pts[10].rgb)
    assert abs(float(np.ravel(o_err)[0]) - 0.25) < 1e-12


def test_qvec_rotmat_match_reference():
    """data/colmap.qvec_to_rotmat / rotmat_to_qvec vs
    scene/colmap_loader.py:43-70 on random rotations."""
    from instantsplat_tpu.data import colmap as C

    cl = load_reference_module("scene.colmap_loader")
    r = _rng(12)
    for _ in range(8):
        q = r.standard_normal(4)
        q /= np.linalg.norm(q)
        np.testing.assert_allclose(
            C.qvec_to_rotmat(q), cl.qvec2rotmat(q), atol=1e-12)
        R = C.qvec_to_rotmat(q)
        q_ref = cl.rotmat2qvec(R)
        q_ours = C.rotmat_to_qvec(R)
        if np.dot(q_ref, q_ours) < 0:
            q_ref = -q_ref
        np.testing.assert_allclose(q_ours, q_ref, atol=1e-9)
