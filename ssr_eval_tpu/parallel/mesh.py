"""Device-mesh utilities for sharded evaluation.

The workload's only parallel dimension is the utterance batch (SURVEY
§2.2): models are small enough to replicate, so the eval pipeline shards
the batch axis over a 1-D `"data"` mesh and lets XLA partition the fused
degrade→infer→metrics program.  Metric aggregation is a mean over
per-utterance scalars — XLA emits the psum; no hand-written collectives
are needed (TP/PP/EP/CP are intentionally out of scope for the eval path
and exercised by the model-parallel training step in
`ssr_eval_tpu.models.train`).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices with a 'data' axis."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for [B, ...] batches."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_batch_for_mesh(n: int, mesh: Mesh | None) -> int:
    """Round a batch size up to a multiple of the data-axis size."""
    if mesh is None:
        return n
    d = mesh.shape["data"]
    return -(-n // d) * d
