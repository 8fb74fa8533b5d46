"""Tensor-parallel parameter sharding for the pointmap transformer.

The scaling-book recipe applied to MASt3R inference: place the weight
matrices with Megatron-style shardings over a `model` mesh axis —
column-split the up-projections (attention qkv / cross-attn q,k,v / MLP
fc1), row-split the down-projections (attention proj / MLP fc2) — and let
XLA's SPMD partitioner insert the all-reduces after each row-sharded
matmul. No model-code changes: the forward (models/mast3r.py) is plain
jnp, so jit with sharded params compiles to the tensor-parallel program.

The reference has no model-parallel capability at all (its transformer
runs whole on one GPU, dust3r/model.py); this is new TPU capability for
serving the 688M-param ViT-L across chips (halving per-chip weight HBM at
TP=2, etc.). Composes with pair-data-parallelism on a 2-D ("data",
"model") mesh: batches sharded over "data", weights over "model".
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path-suffix match, spec) — first hit wins. Column-parallel layers
# shard the OUTPUT feature dim (w axis 1, bias axis 0); row-parallel
# layers shard the INPUT dim (w axis 0) with replicated bias.
_COL = ("qkv", "projq", "projk", "projv", "fc1")
_ROW = ("proj", "fc2")


def _spec_for(path) -> tuple:
    keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
    leaf = keys[-1]
    parent = next((k for k in reversed(keys[:-1]) if isinstance(k, str)),
                  None)
    if parent in _COL:
        return P(None, "model") if leaf == "w" else P("model")
    if parent in _ROW:
        return P("model", None) if leaf == "w" else P()
    return P()


def shard_params_tp(params, mesh: Mesh, strict: bool = False):
    """Place a MASt3R param pytree tensor-parallel over mesh axis
    'model'. Returns the sharded pytree (weights split across chips,
    norms/embeddings/heads replicated).

    The model-axis size must divide every sharded feature dim (ViT-L:
    1024/3072/4096 — TP up to 8); non-dividing leaves (e.g. head MLPs
    with odd widths) fall back to replicated, or raise with strict=True.
    A TP degree that divides NOTHING raises either way — silent
    zero-sharding would defeat the point.
    """
    assert "model" in mesh.axis_names, mesh.axis_names
    n = mesh.shape["model"]
    n_sharded = 0

    def place(path, leaf):
        nonlocal n_sharded
        spec = _spec_for(path)
        for dim, name in enumerate(spec):
            if name == "model" and leaf.shape[dim] % n != 0:
                if strict:
                    raise ValueError(
                        f"{jax.tree_util.keystr(path)}: dim {dim} "
                        f"({leaf.shape[dim]}) not divisible by TP={n}")
                spec = P()
                break
        if any(name == "model" for name in spec):
            n_sharded += 1
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    out = jax.tree_util.tree_map_with_path(place, params)
    if n_sharded == 0:
        raise ValueError(
            f"TP={n} divides no weight dim of this model — every leaf "
            "would be replicated. Pick a TP degree dividing the embed/"
            "mlp/qkv dims.")
    return out
