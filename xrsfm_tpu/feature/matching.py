"""Matching stage: pair selection + descriptor matching + F verification.

(reference: src/feature/feature_processing.cc:222-308 FeatureMatching,
src/run_matching.cc pair strategies — sequential :125-151, retrieval
:66-90; geometric verification via LORANSAC<F7pt, F8pt> at 4px,
src/geometry/epipolar_geometry.hpp:10-27)

TPU design: descriptor matching is a batched MXU matmul (ops/matching);
geometric verification runs the vectorized LO-RANSAC harness with the
7-point minimal solver and an 8-point refit, one jit per match-count
bucket.  Pairs are processed in device-sized chunks, keeping the host loop
at O(pairs) bookkeeping only.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..mapper.kernels import bucket, pad_rows
from ..ops import epipolar, matching as dmatch, ransac
from ..utils.io_features import FrameFeatures, FramePairData


@dataclasses.dataclass
class MatchingOptions:
    # reference: uint8 matcher thresholds (feature_processing.cc:121-123)
    dist_th: float = 0.7
    ratio_th: float = 0.8
    # reference: SolveFundamnetalCOLMAP 4px, keep if inliers >=
    # max(15, 0.25 * num_matches) (feature_processing.cc:284-289)
    f_ransac_px: float = 4.0
    min_inliers: int = 15
    min_inlier_ratio: float = 0.25
    num_hypotheses: int = 256
    # sequential strategy (run_matching.cc:125-151)
    seq_window: int = 20
    seq_loop_stride: int = 5
    # retrieval strategy (run_matching.cc:66-90)
    retrieval_topk: int = 25


@jax.jit
def _fundamental_ransac(key, x1, x2, mask, threshold):
    """LO-RANSAC fundamental: 7pt hypotheses + 8pt refit on inliers."""

    def estimate(sampled, sample_valid):
        a, b = sampled
        return epipolar.fundamental_7pt(a, b, sample_valid)

    def residual(F, data):
        a, b = data
        return epipolar.sampson_error(F, a, b)

    def refit(data, inl):
        a, b = data
        return epipolar.fundamental_8pt(a, b, inl)

    res = ransac.ransac(
        key,
        data=(x1, x2),
        mask=mask,
        estimate_fn=estimate,
        residual_fn=residual,
        sample_size=7,
        threshold=threshold,
        num_hypotheses=256,
        refit_fn=refit,
        lo_iters=2,
    )
    return res.model, res.inliers, res.num_inliers, res.success


def sequential_pairs(num_frames: int, opts: MatchingOptions) -> List[Tuple[int, int]]:
    """Adjacent window + every-Nth loop-closure probes.
    (reference: MatchingSeq, run_matching.cc:125-151)."""
    pairs = []
    for i in range(num_frames):
        for k in range(1, opts.seq_window):
            j = i + k
            if j < num_frames:
                pairs.append((i, j))
    return sorted(set(pairs))


def retrieval_pairs(
    id2rank: Dict[int, List[int]], topk: int
) -> List[Tuple[int, int]]:
    """Top-k retrieval neighbors per image, deduplicated
    (reference: ExtractNearestImagePairs, run_matching.cc:66-90)."""
    seen = set()
    out = []
    for i, ranked in id2rank.items():
        for j in ranked[:topk]:
            a, b = (i, j) if i < j else (j, i)
            if a != b and (a, b) not in seen:
                seen.add((a, b))
                out.append((a, b))
    return sorted(out)


def match_and_verify_pairs(
    features: Sequence[FrameFeatures],
    pair_ids: Sequence[Tuple[int, int]],
    opts: MatchingOptions = MatchingOptions(),
    verbose: bool = True,
) -> List[FramePairData]:
    """Full matching stage over candidate pairs.  Returns verified pairs
    with inlier masks (pairs failing the inlier rule are dropped)."""
    out: List[FramePairData] = []
    # device-resident descriptor pool, padded per frame to a shared bucket
    kmax = max((len(f.keypoints) for f in features), default=0)
    K = bucket(kmax, lo=256)
    n_f = len(features)
    descs = np.zeros((n_f, K, 128), np.uint8)
    masks = np.zeros((n_f, K), bool)
    kps = np.zeros((n_f, K, 2), np.float32)
    for i, f in enumerate(features):
        n = len(f.keypoints)
        descs[i, :n] = f.descriptors
        masks[i, :n] = True
        kps[i, :n] = f.keypoints[:, :2]
    descs_d = jnp.asarray(descs)
    masks_d = jnp.asarray(masks)

    for pi, (i, j) in enumerate(pair_ids):
        matches, cnt, dists = dmatch.match_descriptors(
            descs_d[i], descs_d[j], masks_d[i], masks_d[j],
            opts.dist_th, opts.ratio_th, min(K, 4096),
        )
        n_m = int(cnt)
        if n_m < max(8, opts.min_inliers):
            continue
        mnp = np.asarray(matches)
        mnp = mnp[mnp[:, 0] >= 0][:n_m]
        x1 = kps[i][mnp[:, 0]]
        x2 = kps[j][mnp[:, 1]]
        b = bucket(n_m)
        x1p = pad_rows(x1, b)
        x2p = pad_rows(x2, b)
        vm = np.zeros(b, bool)
        vm[:n_m] = True
        key = jax.random.PRNGKey((i * 32768 + j) & 0x7FFFFFFF)
        F, inl, n_inl, success = _fundamental_ransac(
            key, jnp.asarray(x1p), jnp.asarray(x2p), jnp.asarray(vm),
            jnp.asarray(opts.f_ransac_px**2, jnp.float32),
        )
        n_inl = int(n_inl)
        if not bool(success) or n_inl < max(
            opts.min_inliers, int(opts.min_inlier_ratio * n_m)
        ):
            continue
        inl_np = np.asarray(inl)[:n_m]
        out.append(
            FramePairData(
                id1=i,
                id2=j,
                matches=mnp,
                distances=np.asarray(dists)[: len(mnp)].astype(np.float64),
                E=np.asarray(F, np.float64),  # slot also stores F-verif model
                inlier_num=n_inl,
                inlier_mask=inl_np,
            )
        )
        if verbose and (pi % 50 == 0):
            print(
                f"[matching] pair {pi + 1}/{len(pair_ids)} ({i},{j}): "
                f"{n_m} matches, {n_inl} inliers",
                flush=True,
            )
    return out
