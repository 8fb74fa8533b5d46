"""Import the REFERENCE global aligner (torch, CPU) as a parity oracle.

The reference snapshot at /root/reference can't run its full pipeline here
(empty croco submodule, no cv2/torchvision/roma wheels), but its cloud_opt
subpackage — the global-alignment math this repo re-implements in
init/aligner.py — is pure torch. This module installs minimal stand-ins
for the three missing imports and returns the reference's own
`global_aligner` so tests can compare the two implementations end to end
on identical inputs.

The stand-ins are NOT used by the code paths under test except `roma`,
which is given a real (clean-room, standard-math) implementation of the
four entry points the aligner calls:
  - rotmat_to_unitquat / unitquat_to_rotmat (xyzw convention)
  - RigidUnitQuat(...).normalize().to_homogeneous()
  - rigid_points_registration (weighted Umeyama with scale)
cv2 is backed by this repo's pure-numpy PnP (instantsplat_tpu/init/pnp.py)
for the two entry points the reference's fast_pnp needs —
`solvePnPRansac` and `Rodrigues` (init_im_poses.py:284-298); MST init
genuinely reaches PnP for every camera the spanning-tree walk leaves
unset (init_im_poses.py:209-214), even on complete graphs. torchvision
remains an attribute-erroring husk (never reached by cloud_opt).
"""

from __future__ import annotations

import os
import sys
import types

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "dust3r", "cloud_opt"))


def _install_roma():
    import torch

    roma = types.ModuleType("roma")

    def rotmat_to_unitquat(R):
        # xyzw output (roma convention). Shepperd's method, batched.
        R = torch.as_tensor(R)
        single = R.dim() == 2
        if single:
            R = R[None]
        m00, m01, m02 = R[:, 0, 0], R[:, 0, 1], R[:, 0, 2]
        m10, m11, m12 = R[:, 1, 0], R[:, 1, 1], R[:, 1, 2]
        m20, m21, m22 = R[:, 2, 0], R[:, 2, 1], R[:, 2, 2]
        tr = m00 + m11 + m22
        q = torch.empty(R.shape[0], 4, dtype=R.dtype, device=R.device)

        # four candidate formulations; pick per-row the numerically safest
        w2 = (1 + tr).clamp(min=0)
        x2 = (1 + m00 - m11 - m22).clamp(min=0)
        y2 = (1 - m00 + m11 - m22).clamp(min=0)
        z2 = (1 - m00 - m11 + m22).clamp(min=0)
        case = torch.stack([w2, x2, y2, z2], 1).argmax(1)
        for c in range(4):
            idx = case == c
            if not bool(idx.any()):
                continue
            if c == 0:
                s = torch.sqrt(w2[idx]) * 2
                q[idx, 3] = s / 4
                q[idx, 0] = (m21 - m12)[idx] / s
                q[idx, 1] = (m02 - m20)[idx] / s
                q[idx, 2] = (m10 - m01)[idx] / s
            elif c == 1:
                s = torch.sqrt(x2[idx]) * 2
                q[idx, 3] = (m21 - m12)[idx] / s
                q[idx, 0] = s / 4
                q[idx, 1] = (m01 + m10)[idx] / s
                q[idx, 2] = (m02 + m20)[idx] / s
            elif c == 2:
                s = torch.sqrt(y2[idx]) * 2
                q[idx, 3] = (m02 - m20)[idx] / s
                q[idx, 0] = (m01 + m10)[idx] / s
                q[idx, 1] = s / 4
                q[idx, 2] = (m12 + m21)[idx] / s
            else:
                s = torch.sqrt(z2[idx]) * 2
                q[idx, 3] = (m10 - m01)[idx] / s
                q[idx, 0] = (m02 + m20)[idx] / s
                q[idx, 1] = (m12 + m21)[idx] / s
                q[idx, 2] = s / 4
        q = q / q.norm(dim=-1, keepdim=True)
        return q[0] if single else q

    def unitquat_to_rotmat(q):
        q = torch.as_tensor(q)
        single = q.dim() == 1
        if single:
            q = q[None]
        x, y, z, w = q.unbind(-1)
        R = torch.stack([
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ], dim=-1).reshape(q.shape[0], 3, 3)
        return R[0] if single else R

    class RigidUnitQuat:
        def __init__(self, linear, translation):
            self.linear = torch.as_tensor(linear)
            self.translation = torch.as_tensor(translation)

        def normalize(self):
            n = self.linear.norm(dim=-1, keepdim=True)
            return RigidUnitQuat(self.linear / n, self.translation)

        def to_homogeneous(self):
            R = unitquat_to_rotmat(self.linear)
            single = R.dim() == 2
            if single:
                R = R[None]
            t = self.translation.reshape(R.shape[0], 3)
            out = torch.zeros(R.shape[0], 4, 4,
                              dtype=R.dtype, device=R.device)
            out[:, :3, :3] = R
            out[:, :3, 3] = t
            out[:, 3, 3] = 1.0
            return out[0] if single else out

    def rigid_points_registration(x, y, weights=None, compute_scaling=False):
        # weighted Umeyama: find (s, R, T) minimizing sum w |s R x + T - y|^2
        x = torch.as_tensor(x, dtype=torch.float64)
        y = torch.as_tensor(y, dtype=torch.float64)
        if weights is None:
            w = torch.ones(x.shape[0], dtype=torch.float64)
        else:
            w = torch.as_tensor(weights, dtype=torch.float64).reshape(-1)
        wsum = w.sum()
        mx = (w[:, None] * x).sum(0) / wsum
        my = (w[:, None] * y).sum(0) / wsum
        xc = x - mx
        yc = y - my
        cov = (w[:, None] * yc).T @ xc / wsum
        U, S, Vt = torch.linalg.svd(cov)
        d = torch.sign(torch.det(U @ Vt))
        D = torch.diag(torch.tensor([1.0, 1.0, float(d)],
                                    dtype=torch.float64))
        R = U @ D @ Vt
        var_x = (w[:, None] * xc * xc).sum() / wsum
        s = (S * torch.diag(D)).sum() / var_x
        T = my - s * (R @ mx)
        R, T = R.to(torch.float32), T.to(torch.float32)
        if compute_scaling:
            return R, T, s.to(torch.float32)
        return R, T

    roma.rotmat_to_unitquat = rotmat_to_unitquat
    roma.unitquat_to_rotmat = unitquat_to_rotmat
    roma.RigidUnitQuat = RigidUnitQuat
    roma.rigid_points_registration = rigid_points_registration
    sys.modules["roma"] = roma


def _install_husks():
    class _Husk:
        def __init__(self, *a, **k):
            pass

        def __call__(self, *a, **k):
            raise RuntimeError("reference-oracle husk called")

        def __getattr__(self, name):
            raise RuntimeError(f"reference-oracle husk attribute {name!r}")

    if "cv2" not in sys.modules:
        import numpy as np

        from instantsplat_tpu.init.pnp import _log_so3, _rodrigues, pnp_ransac

        cv2 = types.ModuleType("cv2")
        cv2.SOLVEPNP_SQPNP = 8

        def solvePnPRansac(objpts, imgpts, K, dist, iterationsCount=10,
                           reprojectionError=5, flags=None):
            sol = pnp_ransac(objpts, imgpts, np.asarray(K, np.float64),
                             niter=iterationsCount,
                             reproj_px=reprojectionError)
            if sol is None:
                return False, None, None, None
            R, t, inl = sol
            rvec = _log_so3(R).reshape(3, 1).astype(np.float64)
            tvec = t.reshape(3, 1).astype(np.float64)
            inliers = np.flatnonzero(inl).reshape(-1, 1).astype(np.int32)
            return True, rvec, tvec, inliers

        def Rodrigues(v):
            v = np.asarray(v, np.float64)
            if v.size == 3:
                return _rodrigues(v.reshape(3)).astype(np.float32), None
            return _log_so3(v).reshape(3, 1).astype(np.float32), None

        def _module_getattr(name):
            # dunder lookups (e.g. torch dynamo reading __file__ off every
            # sys.modules entry) must fail with AttributeError, not a husk
            if name.startswith("__"):
                raise AttributeError(name)
            return _Husk()

        cv2.solvePnPRansac = solvePnPRansac
        cv2.Rodrigues = Rodrigues
        cv2.__getattr__ = _module_getattr  # PEP 562
        sys.modules["cv2"] = cv2
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvf = types.ModuleType("torchvision.transforms")

        class _Transform:
            def __init__(self, *a, **k):
                pass

            def __call__(self, x):
                return x

        tvf.ToTensor = tvf.Normalize = tvf.Compose = _Transform
        tv.transforms = tvf
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvf


def load_reference_cloud_opt():
    """Returns (global_aligner, GlobalAlignerMode) from /root/reference."""
    if not reference_available():
        raise RuntimeError("reference snapshot not available")
    _install_roma()
    _install_husks()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from dust3r.cloud_opt import GlobalAlignerMode, global_aligner

    return global_aligner, GlobalAlignerMode


def load_reference_module(name: str):
    """Import any reference module (e.g. 'utils.loss_utils') with the
    same stub environment as the cloud_opt oracle. Used by the
    component-level parity tests (tests/test_reference_components.py).

    'scene.*' submodules are made importable through a namespace stub:
    executing the real scene/__init__.py would pull dataset_readers ->
    plyfile (absent in this environment), so a bare package object with
    __path__ pointing at the reference's scene/ directory is registered
    instead — submodule imports (colmap_loader, cameras) then load their
    files directly without running the package initializer."""
    import importlib

    if not reference_available():
        raise RuntimeError("reference snapshot not available")
    _install_roma()
    _install_husks()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    if "scene" not in sys.modules:
        pkg = types.ModuleType("scene")
        pkg.__path__ = [os.path.join(REFERENCE_ROOT, "scene")]
        sys.modules["scene"] = pkg
    return importlib.import_module(name)


class torch_cuda_to_cpu:
    """Context manager routing hardcoded device='cuda' torch allocations to
    CPU. Several reference utils construct tensors with device='cuda'
    unconditionally (utils/general_utils.py:83 build_rotation,
    :102 build_scaling_rotation); the math is device-independent, so the
    parity tests run them on CPU through this shim."""

    def __enter__(self):
        import torch

        self._torch = torch
        self._orig_zeros = torch.zeros

        def zeros(*a, **k):
            if k.get("device") == "cuda":
                k["device"] = "cpu"
            return self._orig_zeros(*a, **k)

        torch.zeros = zeros
        return self

    def __exit__(self, *exc):
        self._torch.zeros = self._orig_zeros
        return False
