"""Batched SIFT descriptor matching — the MXU workload of the pipeline.

TPU-native replacement for SiftMatchGPU (reference:
3rdparty/SiftGPU/SiftMatchCU.cpp + ProgramCU.cu:1491-1852, consumed by
src/feature/feature_processing.cc:100-154).  The reference computes an
all-pairs descriptor dot-product per image pair on one CUDA device, then
row/column mutual-best with a distance and ratio test.  Here the dot
product is one f32 matmul (lowered onto the MXU), top-2 row/column
reductions give best + second-best, and the accept rule follows the
reference's uint8 path: angular distance < dist_th, best/second ratio
< ratio_th, mutual best (feature_processing.cc:118-154 uses
distance_th=0.7, ratio=0.8 for uint8 descriptors).

Descriptors are L1-root normalized and quantized to uint8 as 512*v
(reference: FeatureDescriptorsToUnsignedByte, sift_extractor.h:22-34), so
cos(angle) = <d1, d2> / 512^2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_QUANT = 512.0


@functools.partial(jax.jit, static_argnames=("max_matches",))
def match_descriptors(
    d1,
    d2,
    mask1,
    mask2,
    dist_th: float = 0.7,
    ratio_th: float = 0.8,
    max_matches: int = 4096,
):
    """Match two uint8 descriptor sets.

    d1 [N,128] uint8, d2 [M,128] uint8, mask1 [N], mask2 [M] validity.
    Returns (matches [max_matches, 2] int32 (padded with -1),
             num_matches, distances [max_matches]).
    """
    # bf16 descriptors: the 128-dim dot product accumulates in f32 on the
    # MXU (preferred_element_type); descriptor values are <=255 so bf16
    # (8-bit mantissa) loses <0.5% on the cosine — well inside the
    # 0.7/0.8 threshold margins.  Storing sim in bf16 halves the HBM
    # traffic of the reduction passes (the matcher is bandwidth-bound).
    f1 = d1.astype(jnp.bfloat16)
    f2 = d2.astype(jnp.bfloat16)
    sim32 = jax.lax.dot_general(
        f1, f2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) / (_QUANT * _QUANT)
    neg = -2.0
    sim = jnp.where(mask1[:, None] & mask2[None, :], sim32, neg).astype(
        jnp.bfloat16
    )

    # top-2 per row via two max passes (TPU top_k lowers to a full sort)
    best_j = jnp.argmax(sim, axis=1)  # [N]
    cos_best = jnp.take_along_axis(sim32, best_j[:, None], axis=1)[:, 0]
    cos_best = jnp.where(mask1, cos_best, neg)
    masked = sim.at[jnp.arange(sim.shape[0]), best_j].set(neg)
    cos_second = jnp.max(masked, axis=1).astype(jnp.float32)
    dist_best = jnp.arccos(jnp.clip(cos_best, -1.0, 1.0))
    dist_second = jnp.arccos(jnp.clip(cos_second, -1.0, 1.0))

    # column best for mutual check
    col_best_i = jnp.argmax(sim, axis=0)  # [M]
    mutual = col_best_i[best_j] == jnp.arange(sim.shape[0])

    ok = (
        mask1
        & (cos_best > neg + 1)
        & (dist_best < dist_th)
        & (dist_best < ratio_th * dist_second)
        & mutual
    )

    # compact to the first max_matches accepted rows
    order = jnp.argsort(~ok)  # accepted rows first (stable)
    rows = order[:max_matches]
    valid = ok[rows]
    matches = jnp.stack(
        [
            jnp.where(valid, rows, -1).astype(jnp.int32),
            jnp.where(valid, best_j[rows], -1).astype(jnp.int32),
        ],
        axis=-1,
    )
    return matches, jnp.sum(ok), jnp.where(valid, dist_best[rows], 0.0)


@functools.partial(jax.jit, static_argnames=("max_matches",))
def match_descriptors_batch(
    d1, d2, mask1, mask2, dist_th=0.7, ratio_th=0.8, max_matches: int = 4096
):
    """vmapped pair matching: d1, d2 [B, K, 128]; masks [B, K]."""
    return jax.vmap(
        lambda a, b, ma, mb: match_descriptors(
            a, b, ma, mb, dist_th, ratio_th, max_matches
        )
    )(d1, d2, mask1, mask2)


@functools.partial(jax.jit, static_argnames=("max_matches",))
def match_descriptors_hamming(
    d1,
    d2,
    mask1,
    mask2,
    dist_th: int = 80,
    ratio_th: float = 0.9,
    max_matches: int = 4096,
):
    """Match two 256-bit ORB descriptor sets (Hamming distance) on the MXU.

    TPU-native replacement for the reference's CPU `OrbMatch`
    (src/feature/feature_processing.cc:156-219: SWAR-popcount all-pairs
    Hamming, accept when best <= 80, best <= 0.9 * second-best, and
    mutual best).  Instead of a popcount loop, descriptors are unpacked
    to 256 {0,1} bits and hamming(a,b) = |a| + |b| - 2 a.b, so the whole
    distance matrix is one bf16 matmul with f32 accumulation (exact:
    all values are small integers).

    d1 [N,32] uint8, d2 [M,32] uint8, mask1 [N], mask2 [M] validity.
    Returns (matches [max_matches, 2] int32 (padded with -1),
             num_matches, distances [max_matches] in bits).
    """
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits1 = ((d1[:, :, None] >> shifts) & 1).reshape(d1.shape[0], 256)
    bits2 = ((d2[:, :, None] >> shifts) & 1).reshape(d2.shape[0], 256)
    b1 = bits1.astype(jnp.bfloat16)
    b2 = bits2.astype(jnp.bfloat16)
    dot = jax.lax.dot_general(
        b1, b2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [N,M]
    n1 = jnp.sum(b1, axis=1, dtype=jnp.float32)
    n2 = jnp.sum(b2, axis=1, dtype=jnp.float32)
    dist = n1[:, None] + n2[None, :] - 2.0 * dot
    big = 1024.0  # > any 256-bit hamming distance
    dist = jnp.where(mask1[:, None] & mask2[None, :], dist, big)

    # top-2 smallest per row via two min passes
    best_j = jnp.argmin(dist, axis=1)  # [N]
    d_best = jnp.take_along_axis(dist, best_j[:, None], axis=1)[:, 0]
    masked = dist.at[jnp.arange(dist.shape[0]), best_j].set(big)
    d_second = jnp.min(masked, axis=1)

    col_best_i = jnp.argmin(dist, axis=0)  # [M]
    mutual = col_best_i[best_j] == jnp.arange(dist.shape[0])

    ok = (
        mask1
        & (d_best < big)
        & (d_best <= dist_th)
        & (d_best <= ratio_th * d_second)
        & mutual
    )

    order = jnp.argsort(~ok)  # accepted rows first (stable)
    rows = order[:max_matches]
    valid = ok[rows]
    matches = jnp.stack(
        [
            jnp.where(valid, rows, -1).astype(jnp.int32),
            jnp.where(valid, best_j[rows], -1).astype(jnp.int32),
        ],
        axis=-1,
    )
    return matches, jnp.sum(ok), jnp.where(valid, d_best[rows], 0.0)


def match_pair_host_hamming(descs1, descs2, dist_th=80, ratio_th=0.9):
    """Host wrapper for ORB matching on [N,32] uint8 descriptor arrays."""
    n, m_ = len(descs1), len(descs2)
    k = 1
    while k < max(n, m_, 64):
        k *= 2
    d1 = np.zeros((k, 32), np.uint8)
    d2 = np.zeros((k, 32), np.uint8)
    d1[:n] = descs1
    d2[:m_] = descs2
    m1 = np.zeros(k, bool)
    m1[:n] = True
    m2 = np.zeros(k, bool)
    m2[:m_] = True
    matches, cnt, dists = match_descriptors_hamming(
        jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(m1), jnp.asarray(m2),
        dist_th, ratio_th, min(k, 4096),
    )
    cnt = int(cnt)
    out = np.asarray(matches)
    out = out[out[:, 0] >= 0][:cnt]
    return out.astype(np.int32), np.asarray(dists)[: len(out)]


def match_pair_host(feats1, feats2, dist_th=0.7, ratio_th=0.8):
    """Convenience host wrapper on FrameFeatures-like (keypoints, descriptors)."""
    n, m_ = len(feats1), len(feats2)
    k = 1
    while k < max(n, m_, 64):
        k *= 2
    d1 = np.zeros((k, 128), np.uint8)
    d2 = np.zeros((k, 128), np.uint8)
    d1[:n] = feats1
    d2[:m_] = feats2
    m1 = np.zeros(k, bool)
    m1[:n] = True
    m2 = np.zeros(k, bool)
    m2[:m_] = True
    matches, cnt, dists = match_descriptors(
        jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(m1), jnp.asarray(m2),
        dist_th, ratio_th, min(k, 4096),
    )
    cnt = int(cnt)
    out = np.asarray(matches)
    out = out[out[:, 0] >= 0][:cnt]
    return out.astype(np.int32), np.asarray(dists)[: len(out)]
