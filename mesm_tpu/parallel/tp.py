"""Tensor parallelism over the `model` mesh axis (capability demonstration).

The reference has no distributed execution of any kind (SURVEY.md §2.7); at
~9M params MESM does not NEED tensor parallelism — this module exists to
demonstrate the TPU-native mechanism: annotate parameter shardings over a
`jax.sharding.Mesh` axis and let GSPMD insert the collectives. No model code
changes; the same jitted train/eval steps run with TP-sharded parameters.

Layout (classic Megatron MLP split, applied to every FFN in the model —
T2V/enhance layers, DETR encoder/decoder layers, SS-recon stack):

    linear1 kernel (D, F):  P(None, "model")   column-parallel
    linear1 bias   (F,):    P("model")
    linear2 kernel (F, D):  P("model", None)   row-parallel
    linear2 bias   (D,):    replicated

The activations between linear1 and linear2 shard over F; XLA inserts one
all-reduce (psum over `model`) after linear2 per FFN — the textbook pattern
(jax-ml.github.io/scaling-book). Attention stays replicated: the packed
qkv kernel (E, 3E) is consumed via jnp.split, whose column slices straddle
shard boundaries and would force GSPMD reshards that cost more than the 9M
params are worth. Validated by tests/test_tp.py: TP-sharded parameters
produce the same losses/predictions as replicated ones on a virtual mesh.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _is_ffn_linear(path_keys, which: str) -> bool:
    names = [getattr(k, "key", str(k)) for k in path_keys]
    return any(n.startswith("ffn") for n in names) and which in names


def tp_param_spec(path_keys, leaf) -> P:
    """PartitionSpec for one parameter leaf under the FFN-split TP layout."""
    names = [getattr(k, "key", str(k)) for k in path_keys]
    if _is_ffn_linear(path_keys, "linear1"):
        if names[-1] == "kernel" and leaf.ndim == 2:
            return P(None, "model")
        if names[-1] == "bias" and leaf.ndim == 1:
            return P("model")
    if _is_ffn_linear(path_keys, "linear2"):
        if names[-1] == "kernel" and leaf.ndim == 2:
            return P("model", None)
    return P()  # replicated


def tp_shard_params(params, mesh: Mesh):
    """device_put every param with its TP sharding over mesh axis `model`.

    Mesh axes must include `model`; `data` may coexist (params never shard
    over `data`). FFN hidden sizes must divide the model-axis size."""
    def put(path, leaf):
        return jax.device_put(leaf, NamedSharding(mesh, tp_param_spec(path, leaf)))

    return jax.tree_util.tree_map_with_path(put, params)


def count_tp_sharded(params) -> int:
    """Number of leaves the TP layout actually shards (sanity/telemetry)."""
    n = 0

    def visit(path, leaf):
        nonlocal n
        if tp_param_spec(path, leaf) != P():
            n += 1
        return leaf

    jax.tree_util.tree_map_with_path(visit, params)
    return n
