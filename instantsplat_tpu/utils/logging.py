"""Training observability: scalar logging + validation reports.

Equivalent of the reference's TensorBoard wiring (train.py:34-38
prepare_output_and_logger + 256-295 training_report): per-iteration scalar
logs and periodic train/test PSNR evaluation. TensorBoard is not available
in this environment, so scalars stream to a JSONL file (one
`{"step": ..., "tag": ..., "value": ...}` line each) that TB/any dashboard
can ingest; the interface mirrors a TB writer so a SummaryWriter can be
dropped in when present.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Optional

import numpy as np


class ScalarLogger:
    """JSONL scalar writer with an add_scalar-compatible interface."""

    def __init__(self, log_dir):
        self.path = Path(log_dir) / "scalars.jsonl"
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._f = open(self.path, "a")
        self._t0 = time.time()

    def add_scalar(self, tag, value, step):
        self._f.write(json.dumps({
            "step": int(step), "tag": str(tag), "value": float(value),
            "wall": round(time.time() - self._t0, 3),
        }) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()


def training_report(
    logger: Optional[ScalarLogger],
    iteration: int,
    metrics: dict,
    testing_iterations=(),
    eval_fn=None,
):
    """Log train scalars; at testing iterations run the validation sweep
    (train.py:262-291): eval_fn() -> {'train': (l1, psnr), 'test': ...}."""
    if logger is not None:
        for k, v in metrics.items():
            logger.add_scalar(f"train/{k}", v, iteration)
    if eval_fn is not None and iteration in set(testing_iterations):
        results = eval_fn()
        for name, (l1v, psnr_v) in results.items():
            print(f"\n[ITER {iteration}] Evaluating {name}: "
                  f"L1 {l1v:.5f} PSNR {psnr_v:.2f}")
            if logger is not None:
                logger.add_scalar(f"{name}/loss_viewpoint-l1", l1v,
                                  iteration)
                logger.add_scalar(f"{name}/loss_viewpoint-psnr", psnr_v,
                                  iteration)
        return results
    return None


def make_eval_fn(params_ref, cameras_by_split, backend="pallas"):
    """Validation closure over the latest params (callable stores a mutable
    reference: pass a 1-element list [params])."""
    import jax.numpy as jnp

    from instantsplat_tpu.ops.losses import l1_loss, psnr
    from instantsplat_tpu.render.driver import render

    def eval_fn():
        params = params_ref[0]
        out = {}
        for name, cams in cameras_by_split.items():
            if not cams:
                continue
            l1s, psnrs = [], []
            for i, cam in enumerate(cams):
                img = jnp.clip(
                    render(params, cam, pose=params.get_pose(i),
                           backend=backend).render, 0.0, 1.0)
                gt = jnp.clip(cam.image, 0.0, 1.0)
                l1s.append(float(l1_loss(img, gt)))
                psnrs.append(float(psnr(img, gt)))
            out[name] = (float(np.mean(l1s)), float(np.mean(psnrs)))
        return out

    return eval_fn
