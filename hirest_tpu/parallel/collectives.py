"""Multi-host object gathering.

The reference all-gathers heterogeneous eval predictions by pickling them
over a cached gloo subgroup (dist_utils.py:84-179). The single-controller
JAX analogue: JSON-serialize to bytes, pad to the global max, and ride one
XLA all_gather over the real devices via
jax.experimental.multihost_utils.process_allgather — no side channel.
Single-process runs short-circuit to the identity.
"""

from __future__ import annotations

import json

import numpy as np


def allgather_objects(obj) -> list:
    """Returns [obj_0, ..., obj_{P-1}] across processes (JSON-serializable)."""
    import jax

    if jax.process_count() == 1:
        return [obj]

    from jax.experimental import multihost_utils

    payload = np.frombuffer(json.dumps(obj).encode("utf-8"), dtype=np.uint8)
    local_len = np.array([payload.size], dtype=np.int32)
    all_lens = np.asarray(multihost_utils.process_allgather(local_len)).reshape(-1)
    max_len = int(all_lens.max())
    padded = np.zeros(max_len, dtype=np.uint8)
    padded[: payload.size] = payload
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    gathered = gathered.reshape(jax.process_count(), max_len)
    return [json.loads(gathered[i, : int(all_lens[i])].tobytes().decode("utf-8"))
            for i in range(jax.process_count())]


def merge_prediction_lists(shards: list[dict]) -> dict:
    """Concatenate per-host accumulator dicts of lists (the shape
    Trainer.predict builds before formatting)."""
    merged: dict = {}
    for shard in shards:
        for key, val in shard.items():
            if isinstance(val, list):
                merged.setdefault(key, []).extend(val)
            else:
                merged[key] = val
    return merged
