"""Reciprocal nearest-neighbor descriptor matching (MASt3R matching core).

TPU-native equivalent of mast3r/fast_nn.py:109-223 `fast_reciprocal_NNs`:
starting from a subsampled pixel grid in image 1, iterate
"NN in image 2 of current image-1 points" <-> "NN in image 1 of those
image-2 points" until fixed point (<= 10 iterations); converged pairs are
reciprocal matches. The reference uses a blocked torch cdist (CUDA) or a
KDTree (CPU); here each NN query is an argmin over a chunked
|q|^2 + |p|^2 - 2 q . p distance matrix whose inner product rides the MXU,
and the ping-pong loop is a fixed-trip fori_loop with convergence masks —
one jitted XLA program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("chunk",))
def nn_indices(queries, database, chunk: int = 4096):
    """[Q, D] x [N, D] -> [Q] index of the nearest database row (L2)."""
    q2 = jnp.sum(queries * queries, -1)
    d2 = jnp.sum(database * database, -1)
    n_q = queries.shape[0]
    n_pad = ((n_q + chunk - 1) // chunk) * chunk
    qp = jnp.pad(queries, ((0, n_pad - n_q), (0, 0)))
    q2p = jnp.pad(q2, (0, n_pad - n_q))

    def body(_, blk):
        qb, q2b = blk
        dist = q2b[:, None] + d2[None, :] - 2.0 * (qb @ database.T)
        return None, jnp.argmin(dist, axis=1)

    _, idx = jax.lax.scan(
        body, None,
        (qp.reshape(-1, chunk, queries.shape[1]),
         q2p.reshape(-1, chunk)),
    )
    return idx.reshape(-1)[:n_q]


@functools.partial(jax.jit, static_argnames=("max_iter", "chunk"))
def _reciprocal_iterate(d1, d2, xy1_init, max_iter: int, chunk: int):
    def step(_, carry):
        xy1, xy2, active = carry
        new_xy2 = jnp.where(active, nn_indices(d1[xy1], d2, chunk), xy2)
        new_xy1 = jnp.where(active, nn_indices(d2[new_xy2], d1, chunk), xy1)
        converged = (new_xy1 == xy1) & (new_xy2 == xy2)
        return new_xy1, new_xy2, active & ~converged

    xy2 = jnp.full_like(xy1_init, -1)
    active = jnp.ones(xy1_init.shape, bool)
    xy1, xy2, active = jax.lax.fori_loop(
        0, max_iter, step, (xy1_init, xy2, active))
    return xy1, xy2, active


def fast_reciprocal_nns(desc1, desc2, subsample=8, max_iter=10,
                        chunk=4096):
    """desc1 [H1,W1,D], desc2 [H2,W2,D] -> (xy1 [M,2], xy2 [M,2]) matched
    (x, y) pixel coordinates of reciprocal fixed points."""
    h1, w1, d = desc1.shape
    h2, w2, _ = desc2.shape
    d1 = jnp.asarray(desc1).reshape(-1, d)
    d2 = jnp.asarray(desc2).reshape(-1, d)

    ys, xs = np.mgrid[subsample // 2:h1:subsample,
                      subsample // 2:w1:subsample].reshape(2, -1)
    xy1_init = jnp.asarray(np.unique(xs + w1 * ys), jnp.int32)

    xy1, xy2, active = _reciprocal_iterate(
        d1, d2, xy1_init, max_iter, chunk)
    xy1, xy2 = np.asarray(xy1), np.asarray(xy2)
    keep = ~np.asarray(active)  # converged = reciprocal
    xy1, xy2 = xy1[keep], xy2[keep]
    pts1 = np.stack([xy1 % w1, xy1 // w1], -1)
    pts2 = np.stack([xy2 % w2, xy2 // w2], -1)
    return pts1, pts2
