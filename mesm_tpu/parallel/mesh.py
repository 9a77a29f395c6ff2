"""Device mesh + sharding layout.

The reference is strictly single-GPU (SURVEY.md section 2.7: no
torch.distributed anywhere). The TPU build scales with a 1-D `data` mesh over
ICI: the batch's row axis is sharded, parameters/optimizer state are
replicated (the model is ~9M params at hidden 256 — sharding them buys
nothing), and XLA inserts the gradient all-reduce. Batch-global interactions
(out-of-group negative sampling, the rec_ss batch-wide InfoNCE) are written
batch-logically; XLA turns the row gathers into ICI collectives.

A `model` axis is reserved in the mesh signature for future tensor-parallel
experiments but is size 1 in every current layout.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Rows sharded over the data axis; all trailing dims replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put every array in the batch with its row axis sharded."""
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


# ---------------------------------------------------------------------------
# sequence-axis sharding (long-video stretch goal, SURVEY.md section 7)
# ---------------------------------------------------------------------------

# batch keys whose SECOND axis is the video-length axis — these get
# P(data, model) so TACoS-length frames spread over the `model` axis; XLA's
# SPMD partitioner inserts the collectives (all-gathers around the DETR
# self-attention, reduce-scatters in the backward pass).
_SEQ_AXIS_KEYS = frozenset({
    "video_feat", "video_mask", "clip_mask", "saliency_label",
    "video_feat_g", "video_mask_g", "ss_video_feat", "ss_video_mask",
})


def seq_batch_sharding(mesh: Mesh, key: str) -> NamedSharding:
    if key in _SEQ_AXIS_KEYS:
        return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch_seq(batch: dict, mesh: Mesh) -> dict:
    """Device-put a batch with rows over `data` AND video length over `model`.

    Use with make_mesh(n, model_parallel=k>1); requires every video-length
    axis to be divisible by k (the collate's bucket sizes are multiples of 8,
    so k in {2, 4, 8} works for the standard buckets)."""
    return {k: jax.device_put(v, seq_batch_sharding(mesh, k)) for k, v in batch.items()}
