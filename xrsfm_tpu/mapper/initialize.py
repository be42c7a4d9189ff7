"""Two-view map initialization.

(reference: FindInitFramePair / CheckInitFramePair / InitializeMap,
src/geometry/map_initializer.cc:13-206)

Candidates are probed in BATCHES: one fused dispatch (essential RANSAC +
pose recovery + triangulation stats) covers a chunk of candidate pairs,
and every gate ladder below is evaluated on host from the cached stats.
The previous one-candidate-at-a-time loop paid 2 dispatches + 2 eager
transfers + 1 fetch per candidate per gate-relaxation attempt (up to 250
round-trips); chunked probing needs ceil(#candidates/16) dispatches and
usually exits after the first.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from . import kernels
from ..base.map import SfMMap

# candidates per fused dispatch (fixed sizes -> one compile per (K, B)).
# The first dispatch probes only the top-4 candidates: the best-matched
# pair passes the strictest gates in the vast majority of scenes, and a
# 4-wide probe is a quarter of the 16-wide RANSAC compute.
_CHUNK_FIRST = 4
_CHUNK = 16


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


def _probe_chunk(m: SfMMap, cands, ransac_px: float, pad_to: int = _CHUNK):
    """Run the fused E-RANSAC + pose/triangulation probe on a chunk of
    candidate pairs (one dispatch + one fetch).  Returns a list of
    per-candidate host dicts with keys q, t, n_good, X, good, ang,
    n_inl, success — arrays already cropped to the true match count."""
    K = len(cands)
    # only the two fixed widths may reach the jit cache
    pad_to = _CHUNK_FIRST if max(pad_to, K) <= _CHUNK_FIRST else _CHUNK
    b = max(kernels.bucket(len(mt)) for _, _, mt in cands)
    keys = np.zeros((pad_to, 2), np.uint32)
    uv1 = np.zeros((pad_to, b, 2), np.float32)
    uv2 = np.zeros((pad_to, b, 2), np.float32)
    mask = np.zeros((pad_to, b), bool)
    th = np.full(pad_to, 1e-6, np.float32)
    for k, (id1, id2, matches) in enumerate(cands):
        n = len(matches)
        uv1[k, :n] = m.kps_norm[id1][matches[:, 0]]
        uv2[k, :n] = m.kps_norm[id2][matches[:, 1]]
        mask[k, :n] = True
        focal = float(m.cameras[int(m.cam_of_frame[id1])][0])
        th[k] = (ransac_px / focal) ** 2
        keys[k] = np.asarray(
            jax.random.PRNGKey((id1 * 32768 + id2) & 0x7FFFFFFF)
        )
    for k in range(K, pad_to):  # pad with a real candidate: SVDs stay sane
        keys[k], uv1[k], uv2[k], mask[k], th[k] = (
            keys[K - 1], uv1[K - 1], uv2[K - 1], mask[K - 1], th[K - 1]
        )
    q, t, n_good, X, good, ang, n_inl, success = jax.device_get(
        kernels.init_probe_batch(keys, uv1, uv2, mask, th)
    )
    out = []
    for k, (_, _, matches) in enumerate(cands):
        n = len(matches)
        out.append(dict(
            q=q[k], t=t[k], n_good=int(n_good[k]), X=X[k, :n],
            good=good[k, :n], ang=ang[k, :n], n_inl=int(n_inl[k]),
            success=bool(success[k]),
        ))
    return out


def _gate(stats, opts: InitOptions):
    """Host-side CheckInitFramePair gates over cached probe stats.
    Returns the accept mask, or None if the candidate fails."""
    if not stats["success"]:
        return None
    n_inl, n_good = stats["n_inl"], stats["n_good"]
    if n_inl == 0 or n_good < opts.min_tri_ratio * n_inl:
        return None
    good, ang = stats["good"], stats["ang"]
    for ang_th in (opts.good_angle_deg, opts.retry_angle_deg):
        n_wide = int(np.count_nonzero(good & (ang > np.deg2rad(ang_th))))
        if n_wide >= opts.min_tri_ratio * n_good and n_good >= opts.min_points:
            return good & np.isfinite(stats["X"]).all(axis=1)
    return None


def check_init_pair(m: SfMMap, id1: int, id2: int, matches, opts: InitOptions):
    """Single-candidate probe + gate (kept for direct callers/tests).
    Returns (ok, q2, t2, xyz [M,3], accept_mask [M])."""
    if len(matches) < 8:
        return False, None, None, None, None
    stats = _probe_chunk(m, [(id1, id2, matches)], opts.ransac_px,
                         pad_to=_CHUNK_FIRST)[0]
    accept = _gate(stats, opts)
    if accept is None:
        return False, None, None, None, None
    return True, stats["q"], stats["t"], stats["X"], accept


def _gate_ladder(opts: InitOptions):
    """Graceful degradation: if no pair clears the gates, retry with
    relaxed minimums.  The reference's fixed gates (>200 points, 16/8 deg
    tri-angle, map_initializer.cc:13-139) assume 8k-feature wide-baseline
    internet images; small scenes need a lower point minimum, and
    video-like forward/arc motion (e.g. KITTI) has single-digit
    triangulation angles on EVERY pair, so the angle ladder extends
    downward rather than failing outright — BA and the track filters
    recover the weaker initial conditioning."""
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
    return attempts


def find_and_initialize(m: SfMMap, opts: InitOptions = InitOptions(),
                        init_id1: int = -1, init_id2: int = -1) -> bool:
    """Pick the best init pair, set the two poses, create initial tracks.

    Candidate order: pairs sorted by inlier-match count descending
    (reference sorts by #matched-frames then #correspondences,
    map_initializer.cc:67-139 — match count is the dense-graph
    equivalent).  A user-forced (init_id1, init_id2) pair probes first.
    """
    order = sorted(
        range(len(m.pairs)), key=lambda i: -len(m.pairs[i][2])
    )[: opts.max_candidates]
    attempts = _gate_ladder(opts)
    if init_id1 >= 0 and init_id2 >= 0:
        # explicit init ids are authoritative (reference: user-set
        # init_id1/init_id2, incremental_mapper.h:14-24): run the forced
        # pair through the ENTIRE relaxation ladder before considering
        # any automatic candidate
        forced = [
            i for i in range(len(m.pairs))
            if {m.pairs[i][0], m.pairs[i][1]} == {init_id1, init_id2}
            and len(m.pairs[i][2]) >= 8
        ]
        for pi in forced:
            id1, id2, matches = m.pairs[pi]
            stats = _probe_chunk(
                m, [(id1, id2, matches)], opts.ransac_px,
                pad_to=_CHUNK_FIRST,
            )[0]
            for att in attempts:
                accept = _gate(stats, att)
                if accept is not None:
                    _commit(m, id1, id2, matches, stats, accept)
                    return True
        order = [i for i in order if i not in forced]
    cands = [m.pairs[pi] for pi in order if len(m.pairs[pi][2]) >= 8]

    # Probe chunk by chunk in priority order.  If any probed candidate
    # passes the STRICTEST attempt we can commit immediately (all
    # unprobed candidates have lower priority); otherwise cache stats
    # and walk the relaxation ladder once everything is probed.
    probed = []
    c0 = 0
    while c0 < len(cands):
        size = _CHUNK_FIRST if c0 == 0 else _CHUNK
        chunk = cands[c0:c0 + size]
        probed.extend(zip(chunk, _probe_chunk(
            m, chunk, opts.ransac_px, pad_to=size
        )))
        for (id1, id2, matches), stats in probed[c0:]:
            accept = _gate(stats, attempts[0])
            if accept is not None:
                _commit(m, id1, id2, matches, stats, accept)
                return True
        c0 += size
    for att in attempts[1:]:
        for (id1, id2, matches), stats in probed:
            accept = _gate(stats, att)
            if accept is not None:
                _commit(m, id1, id2, matches, stats, accept)
                return True
    return False


def _commit(m: SfMMap, id1: int, id2: int, matches, stats, accept):
    """frame1 at identity, frame2 at (q, t); create the initial tracks
    (reference: InitializeMap, map_initializer.cc:141-206)."""
    m.q[id1] = [1.0, 0, 0, 0]
    m.t[id1] = 0.0
    m.q[id2] = stats["q"]
    m.t[id2] = stats["t"]
    m.registered[id1] = True
    m.registered[id2] = True
    m.init_id1, m.init_id2 = id1, id2
    X = stats["X"]
    for k in np.nonzero(accept)[0]:
        tid = m.new_track(X[k])
        m.add_observation(tid, id1, int(matches[k, 0]))
        m.add_observation(tid, id2, int(matches[k, 1]))
