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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_QUANT = 512.0
_BIG = 1e9  # > any raw uint8 descriptor dot product (<= 255^2 * 128)


def _topstats_kernel(d1_ref, d2_ref, m1_ref, m2_ref,
                     best_ref, sec_ref, bestj_ref, colmax_ref, colarg_ref,
                     *, tn: int):
    """Fused per-row-tile matcher statistics.

    One MXU matmul produces the [tn, M] similarity block in VMEM; row
    best/second/argmax and the running column max/argmax (for the mutual
    check) are reduced on the VPU without the [N, M] matrix ever touching
    HBM.  Column stats accumulate across the row-tile grid axis (TPU grid
    steps run sequentially; the col blocks are revisited consecutively).
    uint8 descriptors are exact in bf16 (integers < 2^8) and the f32 MXU
    accumulation is exact (dots < 2^24), so this path is bit-exact."""
    i = pl.program_id(1)
    sim = jax.lax.dot_general(
        d1_ref[0], d2_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [tn, M]
    m1 = m1_ref[0]  # [tn, 1] f32
    m2 = m2_ref[0]  # [1, M] f32
    simr = sim + (m2 - 1.0) * _BIG  # invalid cols -> -BIG
    M = sim.shape[1]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
    rmax = jnp.max(simr, axis=1, keepdims=True)
    bestj = jnp.min(jnp.where(simr >= rmax, col_ids, M), axis=1,
                    keepdims=True)
    sec = jnp.max(jnp.where(col_ids == bestj, -_BIG, simr), axis=1,
                  keepdims=True)
    best_ref[0] = rmax
    sec_ref[0] = sec
    bestj_ref[0] = bestj
    simc = simr + (m1 - 1.0) * _BIG  # invalid rows excluded from col max
    cmax = jnp.max(simc, axis=0, keepdims=True)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 0) + i * tn
    carg = jnp.min(jnp.where(simc >= cmax, row_ids, 1 << 30), axis=0,
                   keepdims=True)

    @pl.when(i == 0)
    def _():
        colmax_ref[0] = cmax
        colarg_ref[0] = carg

    @pl.when(i > 0)
    def _():
        upd = cmax > colmax_ref[0]
        colmax_ref[0] = jnp.where(upd, cmax, colmax_ref[0])
        colarg_ref[0] = jnp.where(upd, carg, colarg_ref[0])


@functools.partial(jax.jit, static_argnames=("interpret",))
def _topstats_pallas(d1, d2, m1, m2, interpret=False):
    """Batched fused matcher statistics.  d1 [B,N,D] uint8, d2 [B,M,D],
    masks [B,N]/[B,M] bool.  Returns (best [B,N], second [B,N],
    best_j [B,N], col_arg [B,M]) with raw (un-normalized) f32 dots."""
    B, N, D = d1.shape
    M = d2.shape[1]
    tn = 256 if (M <= 4096 and N % 256 == 0) else 128
    d1b = d1.astype(jnp.bfloat16)
    d2b = d2.astype(jnp.bfloat16)
    m1f = m1.astype(jnp.float32)[:, :, None]
    m2f = m2.astype(jnp.float32)[:, None, :]
    best, sec, bestj, _, colarg = pl.pallas_call(
        functools.partial(_topstats_kernel, tn=tn),
        grid=(B, N // tn),
        in_specs=[
            pl.BlockSpec((1, tn, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tn, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, N, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, N, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, M), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, M), jnp.int32),
        ],
        interpret=interpret,
    )(d1b, d2b, m1f, m2f)
    return best[:, :, 0], sec[:, :, 0], bestj[:, :, 0], colarg[:, 0, :]


def _pallas_ok(n: int, m: int, d: int) -> bool:
    """The fused kernel needs the full [M, D] block + a [tn, M] f32 sim
    block in VMEM and row tiles dividing N."""
    return d == 128 and m <= 8192 and n % 128 == 0 and m % 128 == 0


@functools.partial(jax.jit, static_argnames=("max_matches",))
def _accept_compact(cos_best, cos_second, best_j, col_arg, mask1,
                    dist_th, ratio_th, max_matches: int):
    """Shared accept rule (distance + ratio + mutual, reference
    feature_processing.cc:118-154) and compaction to the first
    max_matches accepted rows."""
    N = cos_best.shape[0]
    neg = -2.0
    dist_best = jnp.arccos(jnp.clip(cos_best, -1.0, 1.0))
    dist_second = jnp.arccos(jnp.clip(cos_second, -1.0, 1.0))
    mutual = col_arg[best_j] == jnp.arange(N)
    ok = (
        mask1
        & (cos_best > neg + 1)
        & (dist_best < dist_th)
        & (dist_best < ratio_th * dist_second)
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
    return matches, jnp.sum(ok), jnp.where(valid, dist_best[rows], 0.0)


@functools.partial(jax.jit, static_argnames=("max_matches",))
def _match_batch_fused(d1, d2, mask1, mask2, dist_th, ratio_th,
                       max_matches: int):
    interp = jax.default_backend() not in ("tpu", "axon")
    best, sec, bestj, colarg = _topstats_pallas(
        d1, d2, mask1, mask2, interpret=interp
    )
    q2 = _QUANT * _QUANT
    cb = jnp.where(mask1, best / q2, -2.0)
    cs = jnp.clip(sec / q2, -2.0, 1.0)
    return jax.vmap(
        lambda a, b, c, d, m: _accept_compact(
            a, b, c, d, m, dist_th, ratio_th, max_matches
        )
    )(cb, cs, bestj, colarg, mask1)


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

    Routes to the fused Pallas kernel when shapes allow (see
    match_descriptors_batch); the XLA body below is the fallback."""
    if _pallas_ok(d1.shape[0], d2.shape[0], d1.shape[1]):
        m, c, dd = _match_batch_fused(
            d1[None], d2[None], mask1[None], mask2[None],
            dist_th, ratio_th, max_matches,
        )
        return m[0], c[0], dd[0]
    return _match_descriptors_xla(
        d1, d2, mask1, mask2, dist_th, ratio_th, max_matches
    )


@functools.partial(jax.jit, static_argnames=("max_matches",))
def _match_descriptors_xla(
    d1,
    d2,
    mask1,
    mask2,
    dist_th: float = 0.7,
    ratio_th: float = 0.8,
    max_matches: int = 4096,
):
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


def match_descriptors_batch(
    d1, d2, mask1, mask2, dist_th=0.7, ratio_th=0.8, max_matches: int = 4096
):
    """Batched pair matching: d1, d2 [B, K, 128]; masks [B, K].

    Routes to the fused Pallas kernel (one matmul + in-VMEM reductions
    per pair; ~10x the XLA path, which materializes the [K, K] similarity
    matrix in HBM) whenever shapes allow, else to the vmapped XLA path."""
    B, N, D = d1.shape
    M = d2.shape[1]
    if _pallas_ok(N, M, D):
        return _match_batch_fused(
            d1, d2, mask1, mask2, dist_th, ratio_th, max_matches
        )
    return _match_batch_xla(d1, d2, mask1, mask2, dist_th, ratio_th,
                            max_matches)


@functools.partial(jax.jit, static_argnames=("max_matches",))
def _match_batch_xla(
    d1, d2, mask1, mask2, dist_th=0.7, ratio_th=0.8, max_matches: int = 4096
):
    """vmapped XLA fallback for shapes the fused kernel can't take."""
    return jax.vmap(
        lambda a, b, ma, mb: _match_descriptors_xla(
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
