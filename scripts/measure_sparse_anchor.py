"""Measure the sparse-aligner fine-phase 3D-anchor formulations.

VERDICT r4 item 7: the repo's fine loss keeps a 3D coincidence anchor on
PREDICTED depths (a documented deviation — the reference's fine loss is
reprojection-only, sparse_ga.py:377-392,453, with metric structure held
by its kinematic chain). This script measures all three formulations on
the exact-pointmap synthetic scene with a deliberately wrong focal init
(the regime the fine phase exists for) and prints pose/focal errors; the
results are recorded in sparse_global_alignment's docstring.

Run on CPU for determinism:
  JAX_PLATFORMS=cpu python scripts/measure_sparse_anchor.py
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

_repo = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_repo))
sys.path.insert(0, str(_repo / "tests"))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from test_aligner import _relative_pose_error, _synthetic_scene

    from instantsplat_tpu.init.sparse_align import sparse_global_alignment

    c2w_gt, focal, preds = _synthetic_scene(n_views=3)

    def desc_of(pts_in_frame, c2w_i):
        world = pts_in_frame @ c2w_i[:3, :3].T + c2w_i[:3, 3]
        x, y = world[..., 0], world[..., 1]
        f = np.stack([
            x, y, np.sin(0.5 * x), np.cos(0.4 * y),
            np.sin(0.3 * (x + y)), np.ones_like(x),
        ], -1)
        return (f / np.linalg.norm(f, axis=-1, keepdims=True)).astype(
            np.float32)

    preds.desc_i = np.stack([
        desc_of(preds.pred_i[e], c2w_gt[i])
        for e, (i, j) in enumerate(preds.edges)
    ])
    preds.desc_j = np.stack([
        desc_of(preds.pred_j[e], c2w_gt[i])
        for e, (i, j) in enumerate(preds.edges)
    ])

    for focal_tag, focals0 in (("exact_focal", np.full(3, focal)),
                               ("bad_focal_0.6x", np.full(3, 0.6 * focal)),
                               ("weiszfeld_init", None)):
        for mode in ("pred", "depth", "off"):
            res = sparse_global_alignment(
                preds, subsample=4, niter1=300, niter2=300,
                focals=focals0, anchor3d_mode=mode)
            rot_err, t_err = _relative_pose_error(list(res.c2w),
                                                  list(c2w_gt))
            focal_err = float(np.abs(res.focals - focal).max() / focal)
            print(json.dumps({
                "focal_init": focal_tag,
                "anchor3d_mode": mode,
                "rot_err_rad": round(float(rot_err), 8),
                "trans_err_norm": round(float(t_err), 6),
                "focal_err_frac": round(focal_err, 5),
                "final_loss": round(float(res.loss), 6),
            }), flush=True)


if __name__ == "__main__":
    main()
