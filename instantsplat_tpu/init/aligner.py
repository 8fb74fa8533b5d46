"""Global alignment: fuse pairwise pointmaps into one scene + camera poses.

TPU-native re-design of dust3r's `PointCloudOptimizer` + `global_alignment_
loop` (dust3r/cloud_opt/optimizer.py, base_opt.py:288-366), the stage that
turns MASt3R's N*(N-1) pairwise pointmap predictions into a single metric
point cloud with per-image poses, depths and focals.

Same parameterization and loss as the reference:

- per-edge sim3 `pw_poses` [E, 8] = (quat, signed-log1p trans, log scale)
  with the product-of-scales normalized to base_scale (base_opt.py:180-192);
- per-image log-depthmaps [V, A], poses [V, 7] (quat + signed-log1p trans,
  cam-to-world), log-focals scaled by focal_break=20 (optimizer.py:29-33);
- loss = sum over directed edges of conf-weighted L1 between the scene
  points unprojected from (depth, focal, pose) and the edge's pointmap
  transformed by its sim3 (optimizer.py:188-201; conf transform = log,
  dist = l1, per-side normalization by total pixel area);
- init: confidence-scored minimum spanning tree with chained sim3
  registrations (init_im_poses.py:135-221), Weiszfeld focal estimation,
  then per-edge registration onto the fused cloud (init_from_pts3d,
  init_im_poses.py:92-133);
- optimization: Adam(betas=(0.9, 0.9)) with cosine LR 0.01 -> 1e-6, 300
  iterations (base_opt.py:326-366).

TPU mapping: the reference stacks all edges into fixed-shape tensors and
runs thousands of small CUDA kernels per iteration; here the entire
300-iteration loop is ONE jitted `lax.fori_loop` over those stacked
tensors — the whole alignment compiles to a single XLA program. The MST
walk and registrations are tiny (V <= 24) and stay on host.

Pose completion for images the MST walk leaves uninitialized follows the
reference's robust path: RANSAC-PnP of the image's fused world pointmap
against its pixel grid (init_im_poses.py:259-299 `fast_pnp`; pure-numpy
port in init/pnp.py, confidence mask at min_conf_thr), falling back to a
dense confidence-weighted sim3 registration when PnP finds no consensus
(degenerate geometry / too few confident pixels). Deviation from the
reference (documented): the reference estimates some MST focals from a
stale edge variable (init_im_poses.py:170-171 reads `i_j` from the
previous loop iteration); we use the current edge.
"""

from __future__ import annotations

import dataclasses
import functools
import logging

import numpy as np
import scipy.sparse as sp

from instantsplat_tpu.init import geometry as G


@dataclasses.dataclass
class PairPrediction:
    """Stacked pairwise predictions for E directed edges over V images.

    pred_i[e] = image edges[e][0]'s pointmap in its own camera frame;
    pred_j[e] = image edges[e][1]'s pointmap in image edges[e][0]'s frame
    (the MASt3R head-2 output, dust3r/model.py:198-210).
    """

    edges: list[tuple[int, int]]
    pred_i: np.ndarray  # [E, H, W, 3]
    pred_j: np.ndarray  # [E, H, W, 3]
    conf_i: np.ndarray  # [E, H, W]
    conf_j: np.ndarray  # [E, H, W]
    # Mixed-aspect scenes (reference: dust3r/inference.py:62-64 runs them
    # at batch_size=1): maps live on one (Hmax, Wmax) canvas, each image's
    # true raster at the top-left; shapes[v] = its (h, w). Padded pixels
    # MUST carry conf == 1.0 — the aligner's log-conf loss weight is then
    # exactly 0 (genuine MASt3R confs are 1 + exp(x) > 1). None = uniform.
    shapes: np.ndarray | None = None

    @property
    def n_imgs(self):
        return max(max(e) for e in self.edges) + 1

    @property
    def imshape(self):
        return self.pred_i.shape[1:3]


def _pose7_to_c2w_np(p):
    # pure numpy: tiny per-pose 3x3 math must never dispatch to the device
    # (one jit compile of a 3x3 helper costs minutes over the dev tunnel).
    from instantsplat_tpu.data.colmap import qvec_to_rotmat

    q = np.asarray(p[:4], np.float64)
    q = q / np.linalg.norm(q)
    m = np.eye(4)
    m[:3, :3] = qvec_to_rotmat(q)
    m[:3, 3] = G.signed_expm1(np.asarray(p[4:7], np.float64))
    return m


class GlobalAligner:
    """Build from PairPrediction, init with MST, optimize, extract scene."""

    def __init__(
        self,
        preds: PairPrediction,
        min_conf_thr: float = 3.0,
        base_scale: float = 0.5,
        pw_break: float = 20.0,
        focal_break: float = 20.0,
        seed: int = 0,
    ):
        self.preds = preds
        self.edges = list(preds.edges)
        self.edge_index = {e: k for k, e in enumerate(self.edges)}
        self.n_imgs = preds.n_imgs
        self.H, self.W = preds.imshape
        self.area = self.H * self.W
        self.min_conf_thr = min_conf_thr
        self.base_scale = base_scale
        self.pw_break = pw_break
        self.focal_break = focal_break
        # per-image true rasters (mixed-aspect canvases; see PairPrediction)
        if preds.shapes is not None:
            self.shapes = np.asarray(preds.shapes, np.int64)
        else:
            self.shapes = np.tile([self.H, self.W], (self.n_imgs, 1))
        self.mixed = bool((self.shapes != [self.H, self.W]).any())

        # per-image confidence = max over all edge predictions touching it
        # (base_opt.py:128-141 _compute_img_conf)
        self.im_conf = np.zeros((self.n_imgs, self.H, self.W), np.float32)
        for e, (i, j) in enumerate(self.edges):
            self.im_conf[i] = np.maximum(self.im_conf[i], preds.conf_i[e])
            self.im_conf[j] = np.maximum(self.im_conf[j], preds.conf_j[e])

        rng = np.random.default_rng(seed)
        self.params = {
            "pw_poses": rng.standard_normal(
                (len(self.edges), 8)).astype(np.float32),
            "im_poses": rng.standard_normal(
                (self.n_imgs, 7)).astype(np.float32),
            "im_depth": (rng.standard_normal(
                (self.n_imgs, self.area)) / 10 - 3).astype(np.float32),
            "im_focals": (focal_break * np.log(
                self.shapes.max(axis=1, keepdims=True))).astype(np.float32),
        }
        # principal points at each image's TRUE raster center
        self.pp = np.stack([self.shapes[:, 1] / 2.0,
                            self.shapes[:, 0] / 2.0], -1).astype(np.float32)
        self.focals_frozen = False
        self.poses_frozen = False
        self.norm_pw_scale = True

    # ------------------------------------------------------------------
    # host-side initialization
    # ------------------------------------------------------------------

    def _cut(self, arr, v):
        """Slice a canvas map down to image v's true raster (no-op for
        uniform-shape scenes)."""
        h, w = self.shapes[v]
        return arr[:h, :w]

    def _edge_scores(self):
        return {
            (i, j): float(self._cut(self.preds.conf_i[e], i).mean()
                          * self._cut(self.preds.conf_j[e], j).mean())
            for e, (i, j) in enumerate(self.edges)
        }

    def _set_pose(self, arr, idx, R, T, scale=None):
        # numpy quaternion conversion (same wxyz convention as transforms):
        # keeps the per-edge MST walk off the device entirely.
        from instantsplat_tpu.data.colmap import rotmat_to_qvec

        q = rotmat_to_qvec(np.asarray(R, np.float64))
        arr[idx, 0:4] = q
        # translation stored divided by scale (base_opt.py:172): the decode
        # multiplies the whole [:3] rows — rotation AND translation — by the
        # normalized pairwise scale (base_opt.py:190-196 get_pw_poses).
        arr[idx, 4:7] = G.signed_log1p(
            np.asarray(T, np.float64) / (scale or 1.0))
        if scale is not None:
            arr[idx, 7] = np.log(float(scale))

    def init_mst(self, focal_avg=False, known_focal=None, niter_pnp=10):
        """Confidence-MST initialization (init_im_poses.py:66-221)."""
        E = len(self.edges)
        scores = self._edge_scores()
        graph = sp.dok_array((self.n_imgs, self.n_imgs))
        for e, v in scores.items():
            graph[e] = -v
        msp = sp.csgraph.minimum_spanning_tree(graph.tocsr()).tocoo()

        # per-edge views cut to the owning image's true raster (mixed-
        # aspect canvases carry conf-1.0 padding that must not feed the
        # host-side registrations)
        pred_i = {e: self._cut(self.preds.pred_i[k], e[0])
                  for e, k in self.edge_index.items()}
        pred_j = {e: self._cut(self.preds.pred_j[k], e[1])
                  for e, k in self.edge_index.items()}
        conf_i = {e: self._cut(self.preds.conf_i[k], e[0])
                  for e, k in self.edge_index.items()}
        conf_j = {e: self._cut(self.preds.conf_j[k], e[1])
                  for e, k in self.edge_index.items()}

        pts3d = [None] * self.n_imgs
        im_poses = [None] * self.n_imgs
        im_focals = [None] * self.n_imgs

        todo = sorted(zip(-msp.data, msp.row, msp.col))
        _, i, j = todo.pop()
        i, j = int(i), int(j)
        if (i, j) not in pred_i:
            i, j = j, i
        pts3d[i] = pred_i[(i, j)].copy()
        pts3d[j] = pred_j[(i, j)].copy()
        done = {i, j}
        im_poses[i] = np.eye(4)
        im_focals[i] = G.estimate_focal_weiszfeld(pred_i[(i, j)])
        msp_edges = [(i, j)]

        while todo:
            _, i, j = todo.pop()
            i, j = int(i), int(j)
            if (i, j) not in pred_i:
                i, j = j, i
            if i in done and j not in done:
                pass
            elif j in done and i not in done:
                i, j = j, i  # process from the known side
                if (i, j) not in pred_i:
                    # directed edge missing (non-symmetrized graph): defer
                    todo.insert(0, (0, i, j))
                    continue
            elif i in done and j in done:
                continue
            else:
                todo.insert(0, (0, i, j))
                continue
            e = (i, j)
            if im_focals[i] is None:
                im_focals[i] = G.estimate_focal_weiszfeld(pred_i[e])
            s, R, T = G.rigid_points_registration(
                pred_i[e], pts3d[i], conf=conf_i[e])
            trf = G.sRT_to_4x4(s, R, T)
            pts3d[j] = G.geotrf(trf, pred_j[e])
            done.add(j)
            msp_edges.append((i, j))
            if im_poses[i] is None:
                im_poses[i] = G.sRT_to_4x4(1.0, R, T)

        # complete missing focals from the best-scoring edge
        by_score = sorted(scores, key=scores.get, reverse=True)
        for i, j in by_score:
            if im_focals[i] is None:
                im_focals[i] = G.estimate_focal_weiszfeld(pred_i[(i, j)])
        # complete missing poses: RANSAC-PnP of the fused world pointmap
        # against the pixel grid (reference init_im_poses.py:259-299), with
        # the dense conf-weighted registration as fallback when PnP finds
        # no consensus (see module docstring)
        from instantsplat_tpu.init import pnp as _pnp

        for n in range(self.n_imgs):
            if im_poses[n] is None and pts3d[n] is not None:
                conf_n = None
                for i, j in by_score:
                    if i == n:
                        conf_n = conf_i[(i, j)]
                        break
                if conf_n is not None:
                    msk = conf_n > self.min_conf_thr
                    if msk.sum() < _pnp.MIN_PNP_POINTS:
                        msk = conf_n >= np.median(conf_n)
                    res = _pnp.fast_pnp(pts3d[n], im_focals[n], msk,
                                        niter_pnp=niter_pnp)
                    if res is not None:
                        # keep BOTH outputs (init_im_poses.py:213
                        # `im_focals[i], im_poses[i] = res`): when the
                        # focal was unknown, fast_pnp's sweep estimated it
                        im_focals[n], im_poses[n] = (
                            float(res[0]), np.asarray(res[1]))  # cam2world
            if im_poses[n] is None:
                for i, j in by_score:
                    if i == n and pts3d[n] is not None:
                        s, R, T = G.rigid_points_registration(
                            pred_i[(i, j)], pts3d[n], conf=conf_i[(i, j)])
                        im_poses[n] = G.sRT_to_4x4(1.0, R, T)
                        break
            if im_poses[n] is None:
                im_poses[n] = np.eye(4)
        # images that never appear on the i-side of an edge can still have
        # no focal here (the completion loop keys pred_i by i, and PnP may
        # decline): Weiszfeld on the fused cloud in the now-known camera
        # frame, else the median of the known focals — never leave a None
        # for focal_avg's np.mean / _init_from_pts3d's focal write.
        known_f = [f for f in im_focals if f is not None]
        for n in range(self.n_imgs):
            if im_focals[n] is None:
                if pts3d[n] is not None:
                    cam_pts = G.geotrf(
                        np.linalg.inv(im_poses[n]),
                        np.asarray(pts3d[n], np.float64).reshape(-1, 3),
                    ).reshape(pts3d[n].shape)
                    im_focals[n] = G.estimate_focal_weiszfeld(cam_pts)
                elif known_f:
                    im_focals[n] = float(np.median(known_f))
        im_poses = np.stack(im_poses)

        if known_focal is not None:
            for n in range(self.n_imgs):
                im_focals[n] = float(known_focal)
            self.focals_frozen = True
        elif focal_avg:
            avg = float(np.mean(im_focals))
            for n in range(self.n_imgs):
                im_focals[n] = avg
            self.focals_frozen = True

        self._init_from_pts3d(pts3d, im_focals, im_poses)
        return msp_edges

    def _init_from_pts3d(self, pts3d, im_focals, im_poses):
        # per-edge sim3 onto the fused cloud (init_im_poses.py:92-133)
        for e, (i, j) in enumerate(self.edges):
            s, R, T = G.rigid_points_registration(
                self._cut(self.preds.pred_i[e], i), pts3d[i],
                conf=self._cut(self.preds.conf_i[e], i))
            self._set_pose(self.params["pw_poses"], e, R, T, scale=s)

        if self.norm_pw_scale:
            s_factor = float(np.exp(
                np.log(self.base_scale)
                - self.params["pw_poses"][:, 7].mean()))
        else:
            s_factor = 1.0
        im_poses = np.array(im_poses, np.float64)
        im_poses[:, :3, 3] *= s_factor

        for i in range(self.n_imgs):
            cam2world = im_poses[i]
            pts_w = np.asarray(pts3d[i], np.float64) * s_factor
            depth = G.geotrf(np.linalg.inv(cam2world),
                             pts_w.reshape(-1, 3))[:, 2]
            log_d = np.log(np.clip(depth, 1e-8, None)).astype(np.float32)
            h, w = self.shapes[i]
            if (h, w) == (self.H, self.W):
                self.params["im_depth"][i] = log_d
            else:
                # canvas scatter: true raster at the top-left; padded
                # pixels hold the valid median (zero-weight in the loss,
                # but exp() of them must stay sane)
                canvas = np.full((self.H, self.W), np.median(log_d),
                                 np.float32)
                canvas[:h, :w] = log_d.reshape(h, w)
                self.params["im_depth"][i] = canvas.ravel()
            self._set_pose(self.params["im_poses"], i,
                           cam2world[:3, :3], cam2world[:3, 3])
            if im_focals[i] is not None:
                self.params["im_focals"][i] = (
                    self.focal_break * np.log(im_focals[i]))

    # ------------------------------------------------------------------
    # jitted optimization loop
    # ------------------------------------------------------------------

    def _buffers(self):
        import jax.numpy as jnp

        gx, gy = np.meshgrid(np.arange(self.W), np.arange(self.H))
        grid = np.stack([gx, gy], -1).reshape(-1, 2).astype(np.float32)
        ei = np.array([i for i, _ in self.edges], np.int32)
        ej = np.array([j for _, j in self.edges], np.int32)
        # conf transform = log (base_opt.py:46 conf='log')
        w_i = np.log(np.clip(self.preds.conf_i, 1e-8, None))
        w_j = np.log(np.clip(self.preds.conf_j, 1e-8, None))
        E = len(self.edges)
        return dict(
            grid=jnp.asarray(grid),
            pp=jnp.asarray(self.pp),
            pred_i=jnp.asarray(
                self.preds.pred_i.reshape(E, self.area, 3), jnp.float32),
            pred_j=jnp.asarray(
                self.preds.pred_j.reshape(E, self.area, 3), jnp.float32),
            w_i=jnp.asarray(w_i.reshape(E, self.area), jnp.float32),
            w_j=jnp.asarray(w_j.reshape(E, self.area), jnp.float32),
            ei=jnp.asarray(ei),
            ej=jnp.asarray(ej),
        )

    def _loss_fn(self):
        import jax.numpy as jnp

        from instantsplat_tpu.utils import transforms as T

        focal_break = self.focal_break
        base_scale = self.base_scale
        norm_pw_scale = self.norm_pw_scale
        total_i = float(len(self.edges) * self.area)
        total_j = float(len(self.edges) * self.area)

        def unproject(params, buffers):
            focals = jnp.exp(params["im_focals"] / focal_break)  # [V,1]
            depth = jnp.exp(params["im_depth"])  # [V,A]
            xy = (buffers["grid"][None] - buffers["pp"][:, None, :])
            rel = jnp.concatenate(
                [depth[..., None] * xy / focals[..., None],
                 depth[..., None]], -1)  # [V,A,3]
            q = T.quat_normalize(params["im_poses"][:, :4])
            R = T.quat_to_rotmat(q)  # [V,3,3]
            t = G.signed_expm1(params["im_poses"][:, 4:7])
            world = rel @ jnp.swapaxes(R, -1, -2) + t[:, None, :]
            return world

        def loss(params, buffers):
            world = unproject(params, buffers)
            q = T.quat_normalize(params["pw_poses"][:, :4])
            Rw = T.quat_to_rotmat(q)
            logs = params["pw_poses"][:, 7]
            if norm_pw_scale:
                scale = jnp.exp(logs) * jnp.exp(
                    jnp.log(base_scale) - jnp.mean(logs))
            else:
                scale = jnp.exp(logs)
            # scale multiplies rotation AND translation (get_pw_poses)
            Rs = Rw * scale[:, None, None]
            tw = G.signed_expm1(params["pw_poses"][:, 4:7]) * scale[:, None]
            ai = buffers["pred_i"] @ jnp.swapaxes(Rs, -1, -2) + tw[:, None, :]
            aj = buffers["pred_j"] @ jnp.swapaxes(Rs, -1, -2) + tw[:, None, :]
            pi = world[buffers["ei"]]
            pj = world[buffers["ej"]]

            def dist(a, b):  # l1_dist with a grad-safe norm at exactly 0
                d = a - b
                return jnp.sqrt(jnp.sum(d * d, -1) + 1e-16)

            li = jnp.sum(dist(pi, ai) * buffers["w_i"]) / total_i
            lj = jnp.sum(dist(pj, aj) * buffers["w_j"]) / total_j
            return li + lj

        self._unproject = unproject
        return loss

    def align(self, niter=300, lr=0.01, lr_min=1e-6, schedule="cosine",
              mesh=None):
        """Run the jitted alignment loop; returns the final loss.

        With `mesh` (1-D jax.sharding.Mesh), the stacked edge tensors are
        sharded over the mesh axis (edge data parallelism — the E directed
        edges dominate memory and compute at E x H x W x 3) while the
        parameters stay replicated; XLA inserts the gradient psum over ICI
        from the shardings (SURVEY.md §2.2 mapping). When E does not
        divide the mesh, the AREA (H*W pixel) axis of the same tensors is
        sharded instead — identical memory scaling, no edge padding.
        """
        import jax
        import jax.numpy as jnp

        loss_fn = self._loss_fn()
        buffers = self._buffers()
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = list(mesh.axis_names)[0]
            n_dev = mesh.shape[axis]
            if len(self.edges) % n_dev == 0:
                edge_sh = NamedSharding(mesh, P(axis))
                for k in ("pred_i", "pred_j", "w_i", "w_j", "ei", "ej"):
                    buffers[k] = jax.device_put(buffers[k], edge_sh)
            elif self.area % n_dev == 0:
                area_sh = NamedSharding(mesh, P(None, axis))
                for k in ("pred_i", "pred_j", "w_i", "w_j"):
                    buffers[k] = jax.device_put(buffers[k], area_sh)
                # the per-image unprojection inputs split the same way
                buffers["grid"] = jax.device_put(
                    buffers["grid"], NamedSharding(mesh, P(axis)))
            else:  # neither axis divides: stay replicated (correct)
                logging.getLogger(__name__).warning(
                    "aligner: neither %d edges nor %d pixels divide the "
                    "%d-device mesh; running replicated (correct but "
                    "unsharded).", len(self.edges), self.area, n_dev)
                mesh = None
        params = {k: jnp.asarray(v) for k, v in self.params.items()}
        trainable = dict(pw_poses=True,
                         im_poses=not self.poses_frozen,
                         im_depth=True,
                         im_focals=not self.focals_frozen)
        beta1, beta2, eps = 0.9, 0.9, 1e-8

        @functools.partial(jax.jit, static_argnames=("block",))
        def run_block(start, params, m, v, buffers, block: int):
            def step(k, carry):
                params, m, v = carry
                it = start + k
                t = it.astype(jnp.float32) / niter
                if schedule == "cosine":
                    cur_lr = lr_min + (lr - lr_min) * (
                        1 + jnp.cos(t * jnp.pi)) / 2
                else:
                    cur_lr = lr + (lr_min - lr) * t
                loss, grads = jax.value_and_grad(loss_fn)(params, buffers)
                tt = it.astype(jnp.float32) + 1.0
                bc1 = 1 - beta1**tt
                bc2 = 1 - beta2**tt
                new_p, new_m, new_v = {}, {}, {}
                for k in params:
                    g = grads[k]
                    mk = beta1 * m[k] + (1 - beta1) * g
                    vk = beta2 * v[k] + (1 - beta2) * g * g
                    upd = cur_lr * (mk / bc1) / (
                        jnp.sqrt(vk / bc2) + eps)
                    new_p[k] = params[k] - (upd if trainable[k] else 0.0)
                    new_m[k], new_v[k] = mk, vk
                return new_p, new_m, new_v

            return jax.lax.fori_loop(0, block, step, (params, m, v))

        # The loop runs as bounded fori_loop dispatches (identical math to
        # one fused loop; the runtime may enforce a per-execution deadline
        # — ~60 s on the axon dev worker — and E x H x W work makes one
        # fused 300-iteration dispatch arbitrarily slow on large scenes).
        block = max(d for d in range(1, min(50, niter) + 1)
                    if niter % d == 0)
        m = jax.tree.map(jnp.zeros_like, params)
        v = jax.tree.map(jnp.zeros_like, params)
        for s in range(0, niter, block):
            params, m, v = run_block(jnp.int32(s), params, m, v, buffers,
                                     block)
        final_loss = jax.jit(loss_fn)(params, buffers)
        self.params = {k: np.asarray(val) for k, val in params.items()}
        return float(final_loss)

    # ------------------------------------------------------------------
    # extraction
    # ------------------------------------------------------------------

    def get_focals(self):
        return np.exp(
            self.params["im_focals"][:, 0] / self.focal_break)

    def get_intrinsics(self):
        K = np.zeros((self.n_imgs, 3, 3))
        f = self.get_focals()
        K[:, 0, 0] = K[:, 1, 1] = f
        K[:, :2, 2] = self.pp
        K[:, 2, 2] = 1
        return K

    def get_im_poses(self):
        """[V, 4, 4] cam-to-world."""
        return np.stack([
            _pose7_to_c2w_np(p) for p in self.params["im_poses"]])

    def get_depthmaps(self):
        return np.exp(self.params["im_depth"]).reshape(
            self.n_imgs, self.H, self.W)

    def get_log_depthmaps(self):
        """Raw log-depth params — what init_geo.py:58 passes to the co-vis
        mask computation (reference quirk: un-exponentiated)."""
        return self.params["im_depth"].reshape(self.n_imgs, self.H, self.W)

    def get_valid_masks(self):
        """[V, H, W] bool: True on each image's true raster (all-True for
        uniform-shape scenes; mixed-aspect canvases mask the padding)."""
        gy, gx = np.mgrid[:self.H, :self.W]
        return ((gy[None] < self.shapes[:, 0, None, None])
                & (gx[None] < self.shapes[:, 1, None, None]))

    def mask_sky(self, images):
        """Zero sky-pixel confidence (reference base_opt.py:288-295):
        returns a deep copy of this aligner whose im_conf is zeroed
        wherever eval.viz.segment_sky fires on the corresponding image.

        `images`: [V] sequence of [h, w, 3] RGB rasters in [0, 1] floats
        or uint8 — the reference keeps them on the optimizer
        (base_opt.py:120 self.imgs); this aligner stores only predictions,
        so the caller passes them. Mixed-aspect canvases are handled: a
        raster smaller than the canvas masks only its true extent."""
        import copy as _copy

        from instantsplat_tpu.eval.viz import segment_sky

        res = _copy.deepcopy(self)
        for i in range(self.n_imgs):
            sky = segment_sky(np.asarray(images[i]))
            res.im_conf[i][:sky.shape[0], :sky.shape[1]][sky] = 0.0
        return res

    def get_pts3d(self):
        """[V, H, W, 3] world-space pointmaps."""
        f = self.get_focals()[:, None, None]
        depth = self.get_depthmaps()
        gx, gy = np.meshgrid(np.arange(self.W), np.arange(self.H))
        xy = np.stack([gx, gy], -1)[None] - self.pp[:, None, None, :]
        rel = np.concatenate(
            [depth[..., None] * xy / f[..., None], depth[..., None]], -1)
        c2w = self.get_im_poses()
        return np.stack([
            G.geotrf(c2w[i], rel[i].reshape(-1, 3)).reshape(
                self.H, self.W, 3)
            for i in range(self.n_imgs)
        ])


def clean_pointcloud(im_confs, K, cams_w2c, depthmaps, all_pts3d,
                     tol=0.001, bad_conf=0.0):
    """Cross-view confidence suppression (base_opt.py:369-405): project each
    view's points into every other view; points landing IN FRONT of a more
    confident view's surface get their confidence clipped to `bad_conf`.

    im_confs [V,H,W]; K [V,3,3]; cams_w2c [V,4,4]; depthmaps [V,H,W];
    all_pts3d [V,H,W,3] world frame. Returns updated [V,H,W] confidences.
    """
    im_confs = np.array(im_confs, np.float64, copy=True)
    v, h, w = im_confs.shape
    for i in range(v):
        pts = np.asarray(all_pts3d[i]).reshape(-1, 3)
        for j in range(v):
            if i == j:
                continue
            pc = pts @ np.asarray(cams_w2c[j])[:3, :3].T \
                + np.asarray(cams_w2c[j])[:3, 3]
            z = pc[:, 2]
            uu = pc[:, 0] / np.where(z == 0, 1, z) * K[j][0, 0] + K[j][0, 2]
            vv = pc[:, 1] / np.where(z == 0, 1, z) * K[j][1, 1] + K[j][1, 2]
            u = np.round(uu).astype(int)
            vy = np.round(vv).astype(int)
            ok = (z > 0) & (u >= 0) & (u < w) & (vy >= 0) & (vy < h)
            ci = im_confs[i].reshape(-1)
            dj = np.asarray(depthmaps[j]).reshape(h, w)
            cj = im_confs[j]
            bad = np.zeros(len(pts), bool)
            bad[ok] = (z[ok] < (1 - tol) * dj[vy[ok], u[ok]]) & (
                ci[ok] < cj[vy[ok], u[ok]])
            ci[bad] = np.minimum(ci[bad], bad_conf)
            im_confs[i] = ci.reshape(h, w)
    return im_confs


def pair_scene_fast(preds: PairPrediction):
    """PairViewer-equivalent 2-view fast path (dust3r/cloud_opt/
    pair_viewer.py:18-90): no optimization — focals by Weiszfeld, the
    relative pose by dense conf-weighted sim3 registration of view j's
    pointmap-in-i's-frame onto j's own frame (replacing cv2 RANSAC-PnP as
    elsewhere in this module), anchored at whichever directed edge has the
    higher confidence product.

    Returns (c2w [2,4,4], focals [2], depthmaps [2,H,W], pts3d [2,H,W,3]).
    """
    assert preds.n_imgs == 2
    e = {edge: k for k, edge in enumerate(preds.edges)}
    assert (0, 1) in e and (1, 0) in e, "needs a symmetrized pair"
    confs = []
    focals = []
    rel_poses = []
    for i in range(2):
        k = e[(i, 1 - i)]
        confs.append(float(preds.conf_i[k].mean() * preds.conf_j[k].mean()))
        focals.append(G.estimate_focal_weiszfeld(preds.pred_i[k]))
        # pose of camera (1-i) in i's frame: register (1-i)'s own-frame
        # pointmap onto its pointmap expressed in i's frame
        k_rev = e[(1 - i, i)]
        s, R, T = G.rigid_points_registration(
            preds.pred_i[k_rev], preds.pred_j[k],
            conf=preds.conf_j[k])
        rel_poses.append(G.sRT_to_4x4(1.0, R, T))

    h, w = preds.imshape
    if confs[0] > confs[1]:
        k = e[(0, 1)]
        c2w = np.stack([np.eye(4), rel_poses[0]])
        pts0 = preds.pred_i[k]
        pts1 = preds.pred_j[k]
    else:
        k = e[(1, 0)]
        c2w = np.stack([rel_poses[1], np.eye(4)])
        pts1 = preds.pred_i[k]
        pts0 = preds.pred_j[k]
    pts3d = np.stack([pts0, pts1]).astype(np.float64)
    depth = np.stack([
        G.geotrf(np.linalg.inv(c2w[i]),
                 pts3d[i].reshape(-1, 3))[:, 2].reshape(h, w)
        for i in range(2)
    ])
    return c2w, np.array(focals), depth, pts3d


# --------------------------------------------------------------------------
# preset / freeze support (reference preset_pose / preset_focal /
# modular_optimizer's freezable per-image parameters)
# --------------------------------------------------------------------------


def _aligner_preset_pose(self, known_poses, pose_msk=None):
    """Fix (some) image poses to known c2w matrices and freeze them during
    align() (optimizer.py:68-82 preset_pose + modular_optimizer's
    per-image freezing, approximated at group granularity: poses are
    frozen when ALL are preset, matching the InstantSplat usage)."""
    idx = range(self.n_imgs) if pose_msk is None else pose_msk
    for k, i in enumerate(idx):
        m = np.asarray(known_poses[k], np.float64)
        self._set_pose(self.params["im_poses"], i, m[:3, :3], m[:3, 3])
    self.poses_frozen = (pose_msk is None
                         or len(list(pose_msk)) == self.n_imgs)
    # scale normalization is disabled once poses are known
    # (optimizer.py:79-82)
    if self.poses_frozen:
        self.norm_pw_scale = False


GlobalAligner.preset_pose = _aligner_preset_pose
