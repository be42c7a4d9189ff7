"""Two-view map initialization.

(reference: FindInitFramePair / CheckInitFramePair / InitializeMap,
src/geometry/map_initializer.cc:13-206)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from . import kernels
from ..base.map import SfMMap


@dataclasses.dataclass
class InitOptions:
    # reference thresholds (map_initializer.cc): E RANSAC at 10px/f,
    # >= 50% triangulable, >= 50% of those above 16 deg (retry 8 deg),
    # > 200 points for large scenes
    ransac_px: float = 10.0
    min_tri_ratio: float = 0.5
    good_angle_deg: float = 16.0
    retry_angle_deg: float = 8.0
    min_points: int = 100
    max_candidates: int = 50


def _pair_matches_normalized(m: SfMMap, id1: int, id2: int, matches):
    uv1 = m.kps_norm[id1][matches[:, 0]]
    uv2 = m.kps_norm[id2][matches[:, 1]]
    return uv1, uv2


def check_init_pair(m: SfMMap, id1: int, id2: int, matches, opts: InitOptions):
    """Returns (ok, q2, t2, xyz [M,3], accept_mask [M]) for the candidate
    init pair."""
    n = len(matches)
    if n < 8:
        return False, None, None, None, None
    uv1, uv2 = _pair_matches_normalized(m, id1, id2, matches)
    b = kernels.bucket(n)
    uv1p = kernels.pad_rows(uv1, b)
    uv2p = kernels.pad_rows(uv2, b)
    mask = np.zeros(b, bool)
    mask[:n] = True
    focal = float(m.cameras[int(m.cam_of_frame[id1])][0])
    th = (opts.ransac_px / focal) ** 2
    key = jax.random.PRNGKey((id1 * 32768 + id2) & 0x7FFFFFFF)
    # numpy args (jit transfers in one dispatch); E/inl stay device-side
    # between the two kernels; results come back in one device_get
    E, inl, n_inl, success = kernels.essential_ransac(
        key, uv1p, uv2p, mask, th
    )
    q_d, t_d, n_good_d, X_d, good_d, ang_d = kernels.init_pair_stats(
        E, jnp.asarray(uv1p), jnp.asarray(uv2p), inl
    )
    q, t, n_good, X, good, ang, n_inl, success = jax.device_get(
        (q_d, t_d, n_good_d, X_d, good_d, ang_d, n_inl, success)
    )
    if not bool(success):
        return False, None, None, None, None
    good = good[:n]
    ang = ang[:n]
    n_inl_i = int(n_inl)
    if n_inl_i == 0 or int(n_good) < opts.min_tri_ratio * n_inl_i:
        return False, None, None, None, None
    for ang_th in (opts.good_angle_deg, opts.retry_angle_deg):
        n_wide = int(np.count_nonzero(good & (ang > np.deg2rad(ang_th))))
        if n_wide >= opts.min_tri_ratio * int(n_good) and int(n_good) >= opts.min_points:
            accept = good & np.isfinite(X[:n]).all(axis=1)
            return True, q, t, X[:n], accept
    return False, None, None, None, None


def find_and_initialize(m: SfMMap, opts: InitOptions = InitOptions(),
                        init_id1: int = -1, init_id2: int = -1) -> bool:
    """Pick the best init pair, set the two poses, create initial tracks.

    Candidate order: pairs sorted by inlier-match count descending
    (reference sorts by #matched-frames then #correspondences,
    map_initializer.cc:67-139 — match count is the dense-graph equivalent).
    """
    order = sorted(
        range(len(m.pairs)), key=lambda i: -len(m.pairs[i][2])
    )[: opts.max_candidates]
    if init_id1 >= 0 and init_id2 >= 0:
        forced = [
            i for i in order
            if {m.pairs[i][0], m.pairs[i][1]} == {init_id1, init_id2}
        ]
        order = forced + [i for i in order if i not in forced]
    # graceful degradation: if no pair clears the gates, retry with
    # relaxed minimums.  The reference's fixed gates (>200 points,
    # 16/8 deg tri-angle, map_initializer.cc:13-139) assume 8k-feature
    # wide-baseline internet images; small scenes need a lower point
    # minimum, and video-like forward/arc motion (e.g. KITTI) has
    # single-digit triangulation angles on EVERY pair, so the angle
    # ladder extends downward rather than failing outright — BA and the
    # track filters recover the weaker initial conditioning.
    attempts = [opts]
    for mp in (50, 30):
        if mp < opts.min_points:
            attempts.append(dataclasses.replace(opts, min_points=mp))
    mp = min(opts.min_points, 30)
    for good_deg, retry_deg in ((4.0, 2.0), (1.0, 0.5)):
        if good_deg < opts.good_angle_deg:
            attempts.append(dataclasses.replace(
                opts, min_points=mp, good_angle_deg=good_deg,
                retry_angle_deg=retry_deg,
            ))
    for att in attempts:
        if _try_initialize(m, order, att):
            return True
    return False


def _try_initialize(m: SfMMap, order, opts: InitOptions) -> bool:
    for pi in order:
        id1, id2, matches = m.pairs[pi]
        ok, q2, t2, X, accept = check_init_pair(m, id1, id2, matches, opts)
        if not ok:
            continue
        # frame1 at identity, frame2 at (q, t)
        m.q[id1] = [1.0, 0, 0, 0]
        m.t[id1] = 0.0
        m.q[id2] = q2
        m.t[id2] = t2
        m.registered[id1] = True
        m.registered[id2] = True
        m.init_id1, m.init_id2 = id1, id2
        for k in np.nonzero(accept)[0]:
            tid = m.new_track(X[k])
            m.add_observation(tid, id1, int(matches[k, 0]))
            m.add_observation(tid, id2, int(matches[k, 1]))
        return True
    return False
