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


def shard_params_tp(params, mesh: Mesh, check_divisible: bool = True):
    """Place a MASt3R param pytree tensor-parallel over mesh axis
    'model'. Returns the sharded pytree (weights split across chips,
    norms/embeddings/heads replicated).

    The model-axis size must divide every sharded feature dim (ViT-L:
    1024/3072/4096 — TP up to 8); with check_divisible, non-dividing
    leaves fall back to replicated instead of erroring (e.g. head MLPs
    with odd widths).
    """
    assert "model" in mesh.axis_names, mesh.axis_names
    n = mesh.shape["model"]

    def place(path, leaf):
        spec = _spec_for(path)
        for dim, name in enumerate(spec):
            if name == "model" and leaf.shape[dim] % n != 0:
                if not check_divisible:
                    raise ValueError(
                        f"{jax.tree_util.keystr(path)}: dim {dim} "
                        f"({leaf.shape[dim]}) not divisible by TP={n}")
                spec = P()
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
