"""Sharded descriptor matching over a device mesh.

The matching stage is embarrassingly parallel over image pairs (the
reference runs pairs serially through one shared SiftMatchGPU instance,
feature_processing.cc:222-308).  Here a batch of pairs is laid out
[B, K, 128] and sharded over the mesh's "pairs" axis; XLA partitions the
vmapped matmul+top-k automatically, so B pairs match in the time of
B/n_devices.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import matching as dmatch


def match_pairs_sharded(
    mesh: Mesh,
    descs: np.ndarray,  # [F, K, 128] uint8 (padded per frame)
    masks: np.ndarray,  # [F, K] bool
    pair_ids: Sequence[Tuple[int, int]],
    dist_th: float = 0.7,
    ratio_th: float = 0.8,
    max_matches: int = 4096,
    axis: str = "pairs",
):
    """Match all pairs, sharded over the mesh.  Returns per-pair
    (matches [max_matches, 2], count) as numpy arrays."""
    n_dev = mesh.shape[axis]
    B = len(pair_ids)
    pad = (-B) % n_dev
    ids = np.asarray(list(pair_ids) + [pair_ids[0]] * pad, np.int64)

    d1 = descs[ids[:, 0]]
    d2 = descs[ids[:, 1]]
    m1 = masks[ids[:, 0]]
    m2 = masks[ids[:, 1]]
    sh = NamedSharding(mesh, P(axis))
    d1 = jax.device_put(jnp.asarray(d1), sh)
    d2 = jax.device_put(jnp.asarray(d2), sh)
    m1 = jax.device_put(jnp.asarray(m1), sh)
    m2 = jax.device_put(jnp.asarray(m2), sh)
    matches, counts, dists = dmatch.match_descriptors_batch(
        d1, d2, m1, m2, dist_th, ratio_th, max_matches
    )
    matches = np.asarray(matches)[:B]
    counts = np.asarray(counts)[:B]
    dists = np.asarray(dists)[:B]
    return matches, counts, dists
