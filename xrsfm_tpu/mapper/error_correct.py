"""Drift/loop error detection and correction.

(reference: ErrorDetector src/geometry/error_detector.cc:5-159,
ErrorCorrector src/geometry/error_corrector.cc:18-246)

Flow per newly registered frame (reference CheckAndCorrectPose):
  1. detect: for each registered pair of the frame, test whether the
     matches are consistent with the *current* relative pose estimate
     (ray-band test, >= 80% inliers = good; pure-rotation pairs skipped);
  2. on bad pairs, TryLocate: re-register the frame against only the
     tracks seen through the bad-matched neighbors -> a second pose
     hypothesis;
  3. if the hypotheses disagree (> dist_th apart or negative depths),
     declare a loop error: run keyframe selection, build a scale pose
     graph (covisibility edges from current poses + loop edges from the
     two hypotheses + observed depth-ratio scale), solve, propagate
     non-keyframes, re-emit points from ref-frame depths, merge duplicate
     tracks across the loop, then KGBA + filter.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import keyframe as KF, register, triangulate
from ..base.map import SfMMap
from ..optim import pose_graph as PG
from ..optim.ba import BAOptions
from ..ops import epipolar
from ..utils import geometry as G


@dataclasses.dataclass
class ErrorCorrectOptions:
    angle_band_deg: float = 2.0  # reference: sin 2 deg band
    min_good_ratio: float = 0.8  # reference: >= 80% inliers = good pair
    pure_rotation_th: float = 0.01
    hypothesis_dist_th: float = 1.5  # reference: 1.5 (scene units)
    min_covis_engage: int = 10  # engage detection when covis obs < 10
    loop_edge_weight: float = 4.0
    covis_min_shared: int = 10


@jax.jit
def _rel_pose_stats(q1, t1, q2, t2, uv1, uv2, mask, th):
    """One fused device step for the relative-pose consistency test:
    relative pose -> essential -> Sampson -> masked good/total counts.
    Eagerly composing these ops recompiled per match-count shape (~0.5 s
    per tiny XLA program on this host); jit + bucket padding makes the
    whole check one cached dispatch and one host fetch."""
    qr, tr = G.pose_relative(q2, t2, q1, t1)  # T21: x2 = R x1 + t
    baseline = jnp.linalg.norm(tr)
    E = epipolar.essential_from_pose(qr, tr / jnp.maximum(baseline, 1e-12))
    errs = epipolar.sampson_error(E, uv1, uv2)
    good = (errs < th) & mask
    return jnp.stack([
        jnp.sum(good).astype(jnp.float32),
        jnp.sum(mask).astype(jnp.float32),
        baseline,
    ])


_rel_pose_stats_batch = jax.jit(
    jax.vmap(_rel_pose_stats, in_axes=(0, 0, 0, 0, 0, 0, 0, None))
)


def _pair_stats_many(m: SfMMap, pair_list, opts: ErrorCorrectOptions):
    """Relative-pose consistency stats for many (id1, id2, matches)
    tuples in ONE device dispatch + ONE fetch.  The per-pair version cost
    a full axon-tunnel round-trip (~13 ms) per matched neighbor, which
    dominated registration wall time (~10 neighbors/frame).

    Returns [P, 3] numpy (good, total, baseline)."""
    from . import kernels as K

    P = len(pair_list)
    nb = max(K.bucket(max(len(mt) for _, _, mt in pair_list)), 64)
    pb = K.bucket(P, lo=4)
    q1 = np.zeros((pb, 4), np.float32)
    q1[:, 0] = 1.0
    q2 = q1.copy()
    t1 = np.zeros((pb, 3), np.float32)
    t2 = t1.copy()
    uv1 = np.zeros((pb, nb, 2), np.float32)
    uv2 = np.zeros((pb, nb, 2), np.float32)
    mask = np.zeros((pb, nb), bool)
    for i, (id1, id2, mt) in enumerate(pair_list):
        n = len(mt)
        q1[i], t1[i] = m.q[id1], m.t[id1]
        q2[i], t2[i] = m.q[id2], m.t[id2]
        uv1[i, :n] = m.kps_norm[id1][mt[:, 0]]
        uv2[i, :n] = m.kps_norm[id2][mt[:, 1]]
        mask[i, :n] = True
    th = np.float32(float(np.sin(np.deg2rad(opts.angle_band_deg))) ** 2)
    stats = np.asarray(
        _rel_pose_stats_batch(q1, t1, q2, t2, uv1, uv2, mask, th)
    )
    return stats[:P]


def _good_from_stats(stats_row, opts: ErrorCorrectOptions) -> bool:
    good, total, baseline = stats_row
    if baseline < opts.pure_rotation_th:
        return True  # pure rotation: skip (reference behavior)
    return bool(good >= opts.min_good_ratio * max(total, 1.0))


def is_good_relative_pose(m: SfMMap, id1: int, id2: int, matches,
                          opts: ErrorCorrectOptions) -> bool:
    """Matches consistent with the current relative pose?
    (reference: IsGoodRelativePose, error_detector.cc:5-101)."""
    stats = _pair_stats_many(m, [(id1, id2, matches)], opts)
    return _good_from_stats(stats[0], opts)


def check_all_relative_pose(m: SfMMap, frame: int,
                            opts: ErrorCorrectOptions,
                            engage_all: bool = False) -> List[int]:
    """Return neighbors whose relative pose to `frame` disagrees with the
    matches (reference: CheckAllRelativePose, error_detector.cc:103-159).

    engage_all=True checks every registered pair (used as a
    post-registration sanity gate); otherwise only weakly covisible pairs
    are checked, as in the reference."""
    todo = []
    for pid in m.frame_pairs_of[frame]:
        id1, id2, matches = m.pairs[pid]
        other = id2 if id1 == frame else id1
        if not m.registered[other] or len(matches) < 8:
            continue
        if not engage_all:
            # engage only for weakly covisible pairs (suspicious links)
            p2d = matches[:, 0] if id1 == frame else matches[:, 1]
            tids = m.track_of[frame][p2d]
            tids = tids[tids >= 0]
            tids = tids[m.track_valid[tids]]
            shared = sum(1 for t in tids if other in m.track_obs[int(t)])
            if shared >= opts.min_covis_engage:
                continue
        todo.append((id1, id2, matches, other))
    if not todo:
        return []
    stats = _pair_stats_many(m, [(a, b, mt) for a, b, mt, _ in todo], opts)
    return [
        other for (_, _, _, other), s in zip(todo, stats)
        if not _good_from_stats(s, opts)
    ]


def registration_is_consistent(m: SfMMap, frame: int,
                               opts: Optional[ErrorCorrectOptions] = None):
    """Post-registration gate: the new pose must satisfy the epipolar
    geometry of at least half of its matched registered neighbors.

    Catches the planar-PnP two-fold ambiguity: on plane-dominant scenes
    P3P can return a mirrored pose whose reprojections fit but whose
    relative geometry to every neighbor is wrong."""
    opts = opts or ErrorCorrectOptions()
    todo = []
    for pid in m.frame_pairs_of[frame]:
        id1, id2, matches = m.pairs[pid]
        other = id2 if id1 == frame else id1
        if not m.registered[other] or other == frame or len(matches) < 8:
            continue
        todo.append((id1, id2, matches))
    if not todo:
        return True
    stats = _pair_stats_many(m, todo, opts)
    n_bad = sum(1 for s in stats if not _good_from_stats(s, opts))
    return n_bad <= 0.5 * len(todo)


def try_locate(m: SfMMap, frame: int, bad_frames: List[int],
               reg_opts: register.RegisterOptions):
    """Alternative pose hypothesis from the bad-matched subset only
    (reference: TryLocate -> RegisterNextImageLocal,
    error_corrector.cc:120-142 / pnp.cc:133-168)."""
    bad_set = set(bad_frames)
    # restricted correspondence search
    csr = m.corr[frame]
    p2ds, tids = [], []
    counts = np.diff(csr.offsets)
    p2d_of_row = np.repeat(np.arange(len(counts)), counts)
    for row in range(len(csr.other_frame)):
        f2 = int(csr.other_frame[row])
        if f2 not in bad_set or not m.registered[f2]:
            continue
        tid = m.track_of[f2][csr.other_p2d[row]]
        if tid >= 0 and m.track_valid[tid]:
            p2ds.append(int(p2d_of_row[row]))
            tids.append(int(tid))
    if len(p2ds) < reg_opts.min_correspondences:
        return None
    import jax

    from . import kernels

    uv = m.kps_norm[frame][np.asarray(p2ds)]
    xyz = m.track_xyz[np.asarray(tids)].astype(np.float32)
    b = kernels.bucket(len(p2ds))
    mask = np.zeros(b, bool)
    mask[: len(p2ds)] = True
    focal = float(m.cameras[int(m.cam_of_frame[frame])][0])
    q, t, inl, n_inl, ok = jax.device_get(kernels.pnp_ransac(
        jax.random.PRNGKey(frame + 777),
        kernels.pad_rows(uv, b),
        kernels.pad_rows(xyz, b),
        mask,
        (reg_opts.ransac_px / focal) ** 2,
    ))
    if not bool(ok) or int(n_inl) < reg_opts.min_correspondences:
        return None
    return np.asarray(q, np.float64), np.asarray(t, np.float64), int(n_inl)


def _mean_depth(m: SfMMap, frame: int, q, t) -> float:
    p2d, tids = m.frame_observations(frame)
    if len(tids) == 0:
        return 1.0
    xyz = m.track_xyz[tids]
    R = G.quat_to_rotmat_np(q)
    z = (xyz @ R.T + t)[:, 2]
    z = z[z > 0]
    return float(np.mean(z)) if len(z) else 1.0


def correct_loop(m: SfMMap, frame: int, q_alt, t_alt,
                 opts: ErrorCorrectOptions):
    """Scale pose-graph correction
    (reference: error_corrector.cc:187-246 + ScalePoseGraphUnorder)."""
    KF._ensure_fields(m)
    KF.keyframe_selection(m)
    keyframes = [
        f for f in range(m.num_frames) if m.registered[f] and m.is_keyframe[f]
    ]
    if frame not in keyframes:
        keyframes.append(frame)
    idx = {f: i for i, f in enumerate(keyframes)}
    N = len(keyframes)

    # covisibility edges between keyframes (current relative poses)
    edges = []
    for a_i, f in enumerate(keyframes):
        neigh, counts = m.covisible_frames(f, min_shared=opts.covis_min_shared)
        for f2, c in zip(neigh, counts):
            if int(f2) in idx and idx[int(f2)] > a_i:
                edges.append((a_i, idx[int(f2)], 1.0))
    if not edges:
        return False

    pairs = [(a, b) for a, b, _ in edges]
    weights = [w for _, _, w in edges]
    e_i, e_j, e_q, e_t, e_ls, e_w = PG.build_edges_from_poses(
        m.q[keyframes], m.t[keyframes], pairs, weights
    )

    # loop edge: the corrected frame against itself-as-relocated — anchor
    # the alt hypothesis to its strongest bad-side neighbor via the
    # measured relative transform under (q_alt, t_alt)
    d_cur = _mean_depth(m, frame, m.q[frame], m.t[frame])
    d_alt = _mean_depth(m, frame, q_alt, t_alt)
    s_obs = max(d_cur, 1e-6) / max(d_alt, 1e-6)

    # edges from alt pose to covisible keyframes computed with alt pose
    qs = m.q[keyframes].copy()
    ts = m.t[keyframes].copy()
    fi = idx[frame]
    q_save, t_save = qs[fi].copy(), ts[fi].copy()
    qs[fi], ts[fi] = q_alt, t_alt
    neigh, counts = m.covisible_frames(frame, min_shared=1)
    loop_pairs = [
        (fi, idx[int(f2)]) for f2 in neigh if int(f2) in idx
    ][:5]
    if loop_pairs:
        li, lj, lq, lt, lls, lw = PG.build_edges_from_poses(
            qs, ts, loop_pairs,
            [opts.loop_edge_weight] * len(loop_pairs),
        )
        lls = lls + np.log(s_obs)
        e_i = np.concatenate([e_i, li])
        e_j = np.concatenate([e_j, lj])
        e_q = np.concatenate([e_q, lq])
        e_t = np.concatenate([e_t, lt])
        e_ls = np.concatenate([e_ls, lls])
        e_w = np.concatenate([e_w, lw])

    fixed = np.zeros(N, bool)
    fixed[fi] = False
    # anchor: the oldest keyframe
    fixed[0] = True

    prob = PG.PoseGraphProblem(
        q=jnp.asarray(m.q[keyframes], jnp.float32),
        t=jnp.asarray(m.t[keyframes], jnp.float32),
        log_s=jnp.zeros(N, jnp.float32),
        e_i=jnp.asarray(e_i),
        e_j=jnp.asarray(e_j),
        e_rot=jnp.asarray(e_q),
        e_trans=jnp.asarray(e_t),
        e_logs=jnp.asarray(e_ls),
        e_w=jnp.asarray(e_w),
        fixed=jnp.asarray(fixed),
    )
    # store pre-correction ref-frame depths for point re-emission
    track_ref: List[Tuple[int, int, float]] = []  # (tid, kf, depth)
    kf_set = set(keyframes)
    for tid in np.nonzero(m.track_valid[: m.num_tracks])[0]:
        obs = m.track_obs[int(tid)]
        ref = next((f for f in obs if f in kf_set), None)
        if ref is None:
            continue
        R = G.quat_to_rotmat_np(m.q[ref])
        z = float((R @ m.track_xyz[tid] + m.t[ref])[2])
        track_ref.append((int(tid), ref, z))

    t_new, s_new, cost = PG.solve_pose_graph(prob)
    t_new = np.asarray(t_new, np.float64)
    s_new = np.asarray(s_new, np.float64)
    for i, f in enumerate(keyframes):
        m.t[f] = t_new[i]
    KF.update_by_ref_frame(m)

    # re-emit points from ref-frame depth with the per-frame scale
    # (reference: ba_solver.cc:269-327)
    for tid, ref, z in track_ref:
        i = idx[ref]
        p2d = m.track_obs[tid].get(ref)
        if p2d is None:
            continue
        uv = m.kps_norm[ref][p2d]
        ray = np.array([uv[0], uv[1], 1.0]) * z * s_new[i]
        Rr = G.quat_to_rotmat_np(m.q[ref])
        m.track_xyz[tid] = Rr.T @ (ray - m.t[ref])
    return True


def check_and_correct_pose(
    m: SfMMap,
    frame: int,
    opts: ErrorCorrectOptions = ErrorCorrectOptions(),
    reg_opts: register.RegisterOptions = register.RegisterOptions(),
    tri_opts: triangulate.TriOptions = triangulate.TriOptions(),
) -> bool:
    """Full detection + correction for a newly registered frame.
    Returns True if a loop correction was applied."""
    bad = check_all_relative_pose(m, frame, opts)
    if not bad:
        return False
    alt = try_locate(m, frame, bad, reg_opts)
    if alt is None:
        return False
    q_alt, t_alt, _ = alt
    c_cur = G.pose_center_np(m.q[frame], m.t[frame])
    c_alt = G.pose_center_np(q_alt, t_alt)
    if np.linalg.norm(c_cur - c_alt) <= opts.hypothesis_dist_th:
        return False
    corrected = correct_loop(m, frame, q_alt, t_alt, opts)
    if corrected:
        # merge duplicate tracks across the loop + KGBA + filter
        # (reference: MergeTrackLoop + KGBA, error_corrector.cc:144-185,230-241)
        triangulate.merge_frame_tracks(m, frame, tri_opts)
        KF.kgba(m, BAOptions(max_iters=20, huber_px=4.0), tri_opts)
    return corrected
