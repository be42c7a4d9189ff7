"""Drift/loop error detection and correction.

(reference: ErrorDetector src/geometry/error_detector.cc:5-159,
ErrorCorrector src/geometry/error_corrector.cc:18-246)

Flow per newly registered frame (reference CheckAndCorrectPose; steps
marked * are redesigned — each redesign was forced by a measured failure
of the reference recipe on a 360-degree loop with rotational drift, see
docs/benchmark.md):
  1. detect: for each registered pair of the frame, test whether the
     matches are consistent with the *current* relative pose estimate
     (ray-band test, >= 80% inliers = good; pure-rotation pairs skipped);
  2. *TryLocate 2-VIEW (essential + cheirality + map-depth scale) against
     the strongest bad-camp pair — PnP relocation (the reference's) falls
     into the coplanar mirror branch on wall-dominated camps; validate
     the hypothesis epipolarly against its own camp;
  3. if the hypotheses disagree (gate RELATIVE to the median covisible
     baseline), solve a *FULL-POSE scale pose graph (rotations optimized;
     the reference holds them fixed, which cannot remove rotational
     drift); reject the solution if its residual per edge stays high
     (irreconcilable camps would be distorted, not corrected);
  4. fuse duplicate tracks across the loop: keypoint-identity at the
     junction (reference MergeTrackLoop) + *gate-free fusion through the
     verified matches of every epipolar-inconsistent pair (the loop
     bridges), then *batched retriangulation of every track;
  5. *full precise GBA with a damping restart, a global merge sweep once
     corrected geometry lets duplicates pass the reprojection gate, and
     a second GBA (the reference runs keyframe-GBA once — measured to
     strand the solve on an LM plateau after large corrections).
"""

from __future__ import annotations

import dataclasses
from collections import deque
from typing import List, Optional

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
    # The reference gates loop correction on an ABSOLUTE 1.5 m hypothesis
    # distance (error_corrector.cc:219) — tuned for metric phone/KITTI
    # captures.  A scene-units constant misses drift in scenes whose
    # trajectory span is a few units, so the gate here is RELATIVE to the
    # median baseline between the frame and its covisible neighbors
    # (capped by the absolute value for metric compatibility).
    hypothesis_dist_th: float = 1.5  # absolute cap (scene units)
    hypothesis_dist_rel: float = 2.0  # x median covisible baseline
    # TryLocate relocates against a single loop pair's tracks; demanding
    # the full registration minimum (20) starves it exactly where loops
    # announce themselves first (one matched pair across the junction)
    loop_min_correspondences: int = 12
    # The pose-graph solve must strongly reduce the initial loop-edge
    # cost (ratio gate — a per-edge budget would penalize short chains,
    # whose correctly-spread closure discrepancy scales like 1/k per
    # edge) or land at a small absolute per-edge residual.
    max_graph_cost_ratio: float = 0.35
    max_graph_cost_per_edge: float = 0.08
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


def _pair_stats_many(m: SfMMap, pair_list, opts: ErrorCorrectOptions,
                     pose_override=None):
    """Relative-pose consistency stats for many (id1, id2, matches)
    tuples in ONE device dispatch + ONE fetch.  The per-pair version cost
    a full axon-tunnel round-trip (~13 ms) per matched neighbor, which
    dominated registration wall time (~10 neighbors/frame).

    pose_override: optional {frame_id: (q, t)} evaluated instead of the
    map pose — used to validate an alternative hypothesis.

    Returns [P, 3] numpy (good, total, baseline)."""
    from . import kernels as K

    pose_override = pose_override or {}

    def pose(f):
        return pose_override.get(f, (m.q[f], m.t[f]))

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
        q1[i], t1[i] = pose(id1)
        q2[i], t2[i] = pose(id2)
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
               reg_opts: register.RegisterOptions,
               min_corr: Optional[int] = None):
    """Alternative pose hypothesis from the bad-matched camp
    (reference: TryLocate -> RegisterNextImageLocal,
    error_corrector.cc:120-142 / pnp.cc:133-168).

    The reference relocates with PnP against the camp's 3D points.  On
    plane-dominated camps (walls) PnP has the classic coplanar two-fold
    ambiguity and happily returns the mirror branch — observed here as a
    "relocated" pose 9.7 scene units away that still collects >100
    reprojection inliers.  The hypothesis is instead computed 2-VIEW:
    essential RANSAC on the strongest camp pair's matches, pose recovery
    with the cheirality vote (the mirror branch puts points behind the
    cameras and loses), and translation scale from the camp's map depths
    at the matched keypoints.  Returns (q_alt, t_alt, assoc) where assoc
    maps the frame's keypoints to the camp's track ids (for
    merge_track_loop)."""
    min_corr = reg_opts.min_correspondences if min_corr is None else min_corr
    bad_set = set(int(f) for f in bad_frames)
    best = None
    for pid in m.frame_pairs_of[frame]:
        id1, id2, mt = m.pairs[pid]
        other = id2 if id1 == frame else id1
        if other in bad_set and m.registered[other] and len(mt) >= 8:
            if best is None or len(mt) > len(best[2]):
                best = (id1, id2, mt, other)
    if best is None:
        return None
    id1, id2, mt, other = best
    mk_other = mt[:, 0] if id1 == other else mt[:, 1]
    mk_frame = mt[:, 1] if id1 == other else mt[:, 0]
    if len(mt) < min_corr:
        return None
    import jax

    from . import kernels

    uv1 = m.kps_norm[other][mk_other]
    uv2 = m.kps_norm[frame][mk_frame]
    b = kernels.bucket(len(mt))
    mask = np.zeros(b, bool)
    mask[: len(mt)] = True
    focal = float(m.cameras[int(m.cam_of_frame[frame])][0])
    th = (reg_opts.ransac_px / focal) ** 2
    E, inl, n_inl, success = kernels.essential_ransac(
        jax.random.PRNGKey((frame * 31 + other + 777) & 0x7FFFFFFF),
        kernels.pad_rows(uv1, b), kernels.pad_rows(uv2, b), mask, th,
    )
    import jax.numpy as jnp

    q_r, t_r, n_good, X, good, _ang = kernels.init_pair_stats(
        E, jnp.asarray(kernels.pad_rows(uv1, b)),
        jnp.asarray(kernels.pad_rows(uv2, b)), inl,
    )
    q_r, t_r, n_good, X, good, inl, success = jax.device_get(
        (q_r, t_r, n_good, X, good, inl, success)
    )
    if not bool(success) or int(n_good) < min_corr:
        return None
    n = len(mt)
    good = np.asarray(good)[:n] & np.asarray(inl)[:n]
    X = np.asarray(X, np.float64)[:n]  # points in `other`'s camera frame

    # translation scale from the camp's map structure: depth of the
    # matched tracks in `other`'s camera vs the 2-view triangulated depth
    tids = m.track_of[other][mk_other]
    has_track = (tids >= 0)
    has_track[has_track] = m.track_valid[tids[has_track]]
    sel = good & has_track & (X[:, 2] > 1e-6)
    if np.count_nonzero(sel) < 4:
        return None
    R_o = G.quat_to_rotmat_np(m.q[other])
    z_map = (m.track_xyz[tids[sel]] @ R_o.T + m.t[other])[:, 2]
    z_tri = X[sel, 2]
    pos = (z_map > 1e-6) & (z_tri > 1e-6)
    if np.count_nonzero(pos) < 4:
        return None
    s = float(np.median(z_map[pos] / z_tri[pos]))
    if not np.isfinite(s) or s <= 1e-6:
        return None

    # T_frame<-world = T_frame<-other * T_other<-world, translation scaled
    q_alt = G.quat_mul_np(q_r, m.q[other])
    R_r = G.quat_to_rotmat_np(np.asarray(q_r, np.float64))
    t_alt = R_r @ m.t[other] + s * np.asarray(t_r, np.float64)
    assoc = [
        (int(mk_frame[k]), int(tids[k]))
        for k in np.nonzero(good & has_track)[0]
    ]
    return np.asarray(q_alt, np.float64), np.asarray(t_alt, np.float64), assoc


def _mean_depth(m: SfMMap, frame: int, q, t) -> float:
    p2d, tids = m.frame_observations(frame)
    if len(tids) == 0:
        return 1.0
    xyz = m.track_xyz[tids]
    R = G.quat_to_rotmat_np(q)
    z = (xyz @ R.T + t)[:, 2]
    z = z[z > 0]
    return float(np.mean(z)) if len(z) else 1.0


def spread_loop_correction(m: SfMMap, frame: int, q_alt, t_alt,
                           camp1, camp2, s_obs, good_pairs):
    """Distribute the junction Sim3 mismatch smoothly around the loop.

    The camp-2 hypothesis says the junction frame sits at (q_alt, t_alt)
    with depth ratio s_obs; the chain (camp 1) says (m.q[frame],
    m.t[frame]).  The world similarity mapping camp-2 content onto
    camp 1 is D = (s_obs, R_cur^T R_alt, R_cur^T (s_obs t_alt - t_cur)).
    Each registered frame gets the fractional correction D^{w_f} with
    w_f = d1 / (d1 + d2), d1/d2 = BFS hop distance from camp 1 / camp 2
    over the epipolar-CONSISTENT pair graph — the topology-aware arc
    position, which matches how the drift physically accumulated.

    Why not let the pose graph do this: with a per-node scale the
    single-cycle graph has an exactly-consistent solution MANIFOLD, and
    LM converges to the nearest point — the correction concentrated at
    the weakest graph cut (measured: a 14-keyframe junction block
    rotated 12 degrees rigidly, 5.7M reprojection cost, frozen LM).
    Spreading is the initialization that selects the distributed point
    on that manifold; the pose graph then refines it.  Returns w [F]
    (nan for unregistered frames)."""
    F = m.num_frames
    # BFS over consistent pairs
    adj = [[] for _ in range(F)]
    for a, b in good_pairs:
        adj[a].append(b)
        adj[b].append(a)

    def bfs(seeds):
        d = np.full(F, np.inf)
        dq = deque()
        for s in seeds:
            if m.registered[s]:
                d[s] = 0.0
                dq.append(s)
        while dq:
            x = dq.popleft()
            for y in adj[x]:
                if m.registered[y] and d[y] == np.inf:
                    d[y] = d[x] + 1.0
                    dq.append(y)
        return d

    d1 = bfs([int(f) for f in camp1])
    d2 = bfs([int(f) for f in camp2])
    both = np.isfinite(d1) & np.isfinite(d2)
    w = np.full(F, np.nan)
    w[both] = d1[both] / np.maximum(d1[both] + d2[both], 1.0)
    # frames reachable from only one side take that side's correction
    w[np.isfinite(d1) & ~np.isfinite(d2)] = 0.0
    w[~np.isfinite(d1) & np.isfinite(d2)] = 1.0
    w[frame] = 0.0  # the junction frame keeps its camp-1 pose

    q_cur = np.asarray(m.q[frame], np.float64)
    t_cur = np.asarray(m.t[frame], np.float64)
    q_D = G.quat_mul_np(q_cur * np.array([1.0, -1, -1, -1]),
                        np.asarray(q_alt, np.float64))
    R_cur = G.quat_to_rotmat_np(q_cur)
    R_D = G.quat_to_rotmat_np(q_D)
    t_D = R_cur.T @ (s_obs * np.asarray(t_alt, np.float64) - t_cur)
    # one-parameter subgroup D^w via the Sim(3) log/exp (screw
    # interpolation): independent per-component interpolation of a
    # large-translation similarity rotates intermediate frames about the
    # wrong center and made the map WORSE than no correction (measured
    # ATE 4.8% -> 8.3%); the geodesic preserves the screw axis, which is
    # the natural model for smoothly accumulated drift
    sigma_D, omega_D, ups_D = G.sim3_log_np(s_obs, R_D, t_D)
    for f in range(F):
        if not m.registered[f] or not np.isfinite(w[f]) or w[f] <= 0:
            continue
        wf = float(w[f])
        s_s, R_s, t_s = G.sim3_exp_np(
            wf * sigma_D, wf * omega_D, wf * ups_D
        )
        Rf = G.quat_to_rotmat_np(m.q[f])
        # world similarity x' = s_s R_s x + t_s  =>  R' = R R_s^T,
        # t' = s_s t - R R_s^T t_s  (reprojection-invariant update)
        R_new = Rf @ R_s.T
        m.q[f] = G.rotmat_to_quat_np(R_new)
        m.t[f] = s_s * m.t[f] - R_new @ t_s
    return w


def correct_loop(m: SfMMap, frame: int, q_alt, t_alt, camp2: List[int],
                 opts: ErrorCorrectOptions):
    """Loop correction: spread the junction Sim3 mismatch around the
    cycle, then refine with the full-pose scale pose graph over ALL
    registered frames (reference: error_corrector.cc:187-246 +
    ScalePoseGraphUnorder — which runs on keyframes and re-anchors;
    here the sparse PCG pose-graph solver makes every frame a node, so
    no propagation step can go stale).

    camp2 is the set of matched frames whose epipolar geometry disagrees
    with the current PnP pose — the side the alt hypothesis (q_alt,
    t_alt) was located against.  Mirroring the reference's
    DivideMatchedFrames/AddLoopEdge: loop edges anchor each hypothesis
    ONLY to its own camp (current pose -> camp-1 neighbors, alt pose ->
    camp-2 neighbors); an alt-pose edge to a camp-1 frame would fight the
    correction it is supposed to deliver."""
    camp2_set = set(int(f) for f in camp2)
    neigh_all, _ = m.covisible_frames(frame, min_shared=1)
    camp1 = [int(f) for f in neigh_all if int(f) not in camp2_set][:5]
    if not camp1:
        return False

    # pair graph restricted to epipolar-CONSISTENT registered pairs:
    # inconsistent pairs are the loop bridges — a graph edge built from
    # their CURRENT (drifted) relative pose would fight the correction
    cand = [
        (a, b, mt) for a, b, mt in m.pairs
        if a != frame and b != frame
        and m.registered[a] and m.registered[b]
        and len(mt) >= opts.covis_min_shared
    ]
    if not cand:
        return False
    stats = _pair_stats_many(m, cand, opts)
    good_pairs = [
        (a, b) for (a, b, _mt), s in zip(cand, stats)
        if _good_from_stats(s, opts)
    ]
    if not good_pairs:
        return False

    # observed depth-ratio between the hypotheses -> loop-edge scale
    # (reference: GetLoopInfo, error_corrector.cc:66-95)
    d_cur = _mean_depth(m, frame, m.q[frame], m.t[frame])
    d_alt = _mean_depth(m, frame, q_alt, t_alt)
    s_obs = max(d_cur, 1e-6) / max(d_alt, 1e-6)

    nodes = [int(f) for f in np.nonzero(m.registered)[0]]
    idx = {f: i for i, f in enumerate(nodes)}
    N = len(nodes)
    fi = idx[frame]

    # measurement edges from the PRE-spread map (drift-consistent
    # relative poses); the corrected frame's own edges are the loop
    # edges below
    pairs = [(idx[a], idx[b]) for a, b in good_pairs]
    e_i, e_j, e_q, e_t, e_ls, e_w = PG.build_edges_from_poses(
        m.q[nodes], m.t[nodes], pairs, [1.0] * len(pairs)
    )

    # loop edges: current hypothesis -> camp 1, alt hypothesis -> camp 2
    loop_specs = []  # (pairs, q_of_frame, t_of_frame, extra_logs)
    camp1_pairs = [(fi, idx[f]) for f in camp1 if f in idx]
    camp2_pairs = [(fi, idx[f]) for f in sorted(camp2_set)
                   if f in idx and m.registered[f]][:5]
    if not camp2_pairs:
        return False
    loop_specs.append((camp1_pairs, m.q[frame].copy(), m.t[frame].copy(),
                       0.0))
    loop_specs.append((camp2_pairs, q_alt, t_alt, np.log(s_obs)))
    qs = m.q[nodes].copy()
    ts = m.t[nodes].copy()
    for loop_pairs, qf, tf, extra_ls in loop_specs:
        qs[fi], ts[fi] = qf, tf
        li, lj, lq, lt, lls, lw = PG.build_edges_from_poses(
            qs, ts, loop_pairs,
            [opts.loop_edge_weight] * len(loop_pairs),
        )
        lls = lls + extra_ls
        e_i = np.concatenate([e_i, li])
        e_j = np.concatenate([e_j, lj])
        e_q = np.concatenate([e_q, lq])
        e_t = np.concatenate([e_t, lt])
        e_ls = np.concatenate([e_ls, lls])
        e_w = np.concatenate([e_w, lw])

    # keep a rollback copy, then spread the correction as initialization
    q_before = m.q.copy()
    t_before = m.t.copy()
    w_arc = spread_loop_correction(
        m, frame, q_alt, t_alt, camp1, sorted(camp2_set), s_obs, good_pairs
    )
    log_s0 = np.nan_to_num(
        np.asarray([w_arc[f] for f in nodes], np.float64), nan=0.0
    ) * np.log(max(s_obs, 1e-6))

    # anchor the gauge at the most camp1-consistent node (w = 0)
    fixed = np.zeros(N, bool)
    anchor = int(np.argmin([
        w_arc[f] if np.isfinite(w_arc[f]) else 2.0 for f in nodes
    ]))
    fixed[anchor if anchor != fi else (anchor + 1) % N] = True

    prob = PG.PoseGraphProblem(
        q=jnp.asarray(m.q[nodes], jnp.float32),
        t=jnp.asarray(m.t[nodes], jnp.float32),
        log_s=jnp.asarray(log_s0, jnp.float32),
        e_i=jnp.asarray(e_i),
        e_j=jnp.asarray(e_j),
        e_rot=jnp.asarray(e_q),
        e_trans=jnp.asarray(e_t),
        e_logs=jnp.asarray(e_ls),
        e_w=jnp.asarray(e_w),
        fixed=jnp.asarray(fixed),
    )
    q_new, t_new, s_new, _cost, _cost0 = jax.device_get(
        PG.solve_pose_graph(prob)
    )
    print(f"[mapper] loop pose graph: N={N} E={len(e_i)} "
          f"cost {float(_cost0):.4f} -> {float(_cost):.4f}", flush=True)
    if (float(_cost) > opts.max_graph_cost_ratio * max(float(_cost0), 1e-12)
            and float(_cost) > opts.max_graph_cost_per_edge * len(e_i)):
        # the camps cannot be reconciled — applying this solution would
        # distort the map; roll the spread back and leave the map as-is
        m.q[:] = q_before
        m.t[:] = t_before
        return False
    q_new = np.asarray(q_new, np.float64)
    t_new = np.asarray(t_new, np.float64)
    for i, f in enumerate(nodes):
        m.q[f] = q_new[i]
        m.t[f] = t_new[i]

    # Rebuild the structure under the corrected poses by batched
    # multi-view retriangulation of EVERY track.  The reference instead
    # re-emits each point from its ref-keyframe depth times the solved
    # per-frame scale (ba_solver.cc:269-327) — the cheap option when
    # points are touched one-by-one on CPU, but it keeps the
    # pre-correction depth error.  Retriangulation from all observations
    # is one padded device call here and hands the follow-up BA a
    # self-consistent starting structure.
    all_tracks = np.nonzero(m.track_valid[: m.num_tracks])[0]
    triangulate.retriangulate(m, all_tracks)
    return True


def merge_track_loop(m: SfMMap, frame: int, assoc, camp2) -> int:
    """Fuse duplicate tracks across the loop BY KEYPOINT IDENTITY
    (reference: MergeTrackLoop, error_corrector.cc:144-185).

    assoc maps the junction frame's keypoints to camp-2 tracks (the
    TryLocate inliers).  The camp-1 partner for the same physical point
    is found through the junction keypoint: either the frame's own
    track (direct registration extension) or — far more often, since
    extension only covers the PnP inliers — ONE HOP through the
    correspondence graph (the keypoint's verified match in a camp-1
    frame that already carries a track).  Both associations observe the
    same point, so the tracks are merged UNCONDITIONALLY — a
    reprojection gate (as in ordinary MergeTracks) can never pass while
    residual loop drift remains, and these long cross-loop tracks are
    precisely what gives the follow-up BA enough constraint votes to
    pull the loop closed."""
    camp2_set = set(int(f) for f in camp2)
    # one-hop camp-1 track lookup per junction keypoint (vectorized
    # over the frame's CSR rows)
    csr = m.corr[frame]
    counts = np.diff(csr.offsets)
    p2d_of_row = np.repeat(np.arange(len(counts)), counts)
    rf, rp = csr.other_frame, csr.other_p2d
    row_tid = np.full(len(rf), -1, np.int64)
    camp1_row = np.zeros(len(rf), bool)
    for f2 in np.unique(rf):
        f2i = int(f2)
        sel = rf == f2
        if not m.registered[f2i] or f2i in camp2_set or f2i == frame:
            continue
        camp1_row[sel] = True
        row_tid[sel] = m.track_of[f2i][rp[sel]]
    ok_row = camp1_row & (row_tid >= 0)
    ok_row[ok_row] = m.track_valid[row_tid[ok_row]]
    camp1_of_p2d = {}
    for r in np.nonzero(ok_row)[0]:
        camp1_of_p2d.setdefault(int(p2d_of_row[r]), int(row_tid[r]))

    merged = 0
    for p2d, tid2 in assoc:
        p2d, tid2 = int(p2d), int(tid2)
        if not m.track_valid[tid2]:
            continue
        tid1 = int(m.track_of[frame][p2d])
        if tid1 < 0 or not m.track_valid[tid1]:
            tid1 = camp1_of_p2d.get(p2d, -1)
        if tid1 == tid2:
            continue
        if tid1 >= 0 and m.track_valid[tid1]:
            # the two tracks are the same physical point: union the
            # observations into the camp-2 track (injective per frame)
            for f, p in list(m.track_obs[tid1].items()):
                m.remove_observation(tid1, f, p)
                if m.track_valid[tid2] and f not in m.track_obs[tid2]:
                    m.add_observation(tid2, f, p)
            if m.track_valid[tid1]:
                m.delete_track(tid1)
            merged += 1
        elif frame not in m.track_obs[tid2]:
            m.add_observation(tid2, frame, p2d)
    return merged


def fuse_inconsistent_pair_tracks(m: SfMMap,
                                  opts: ErrorCorrectOptions) -> int:
    """Fuse tracks bridged by the verified matches of epipolar-
    INCONSISTENT registered pairs.

    A pair whose matches were LO-RANSAC-verified at matching time but
    whose current relative pose fails the consistency band is exactly a
    loop bridge the incremental map failed to integrate: each side built
    its own track for the same physical point.  The matches certify
    point identity independently of the (drifted) poses, so the fusion
    needs NO reprojection gate — unlike the ordinary MergeTracks sweep,
    which can only fire after geometry is already corrected.  Union-find
    over track ids, then one pass applying each union."""
    todo = []
    for pid, (id1, id2, matches) in enumerate(m.pairs):
        if (m.registered[id1] and m.registered[id2] and len(matches) >= 8):
            todo.append((id1, id2, matches))
    if not todo:
        return 0
    stats = _pair_stats_many(m, todo, opts)
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    n_ext = 0
    for (id1, id2, matches), s in zip(todo, stats):
        if _good_from_stats(s, opts):
            continue
        t1 = m.track_of[id1][matches[:, 0]]
        t2 = m.track_of[id2][matches[:, 1]]
        v1 = (t1 >= 0) & m.track_valid[np.clip(t1, 0, None)]
        v2 = (t2 >= 0) & m.track_valid[np.clip(t2, 0, None)]
        for a, b in zip(t1[v1 & v2 & (t1 != t2)], t2[v1 & v2 & (t1 != t2)]):
            union(int(a), int(b))
        # one side trackless (common at the fresh end of the arm, where
        # drift blocked extension/creation): join the tracked side's
        # track — the verified match certifies the point identity
        for k in np.nonzero(v1 & ~v2)[0]:
            tid, f, p = int(t1[k]), int(id2), int(matches[k, 1])
            if f not in m.track_obs[tid] and m.track_of[f][p] < 0:
                m.add_observation(tid, f, p)
                n_ext += 1
        for k in np.nonzero(v2 & ~v1)[0]:
            tid, f, p = int(t2[k]), int(id1), int(matches[k, 0])
            if f not in m.track_obs[tid] and m.track_of[f][p] < 0:
                m.add_observation(tid, f, p)
                n_ext += 1
    if not parent:
        return n_ext
    groups = {}
    for t in list(parent):
        groups.setdefault(find(t), []).append(t)
    merged = 0
    for root, members in groups.items():
        if not m.track_valid[root]:
            continue
        for t in members:
            if t == root or not m.track_valid[t]:
                continue
            for f, p in list(m.track_obs[t].items()):
                m.remove_observation(t, f, p)
                if m.track_valid[root] and f not in m.track_obs[root]:
                    m.add_observation(root, f, p)
            if m.track_valid[t]:
                m.delete_track(t)
            merged += 1
    return merged + n_ext


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
    # Structural-loop test: a genuine loop error lives in the MAP — some
    # registered pair NOT involving this frame is itself epipolar-
    # inconsistent (the two camps disagree with each other, not merely
    # with the new frame's PnP pose).  If every such pair is consistent,
    # the problem is this frame's own registration; correcting the map
    # would distort it (observed: a second "correction" firing on an
    # already-closed loop) — let the reject/retry path handle the frame.
    others = [
        (a, b, mt) for a, b, mt in m.pairs
        if a != frame and b != frame and len(mt) >= 8
        and m.registered[a] and m.registered[b]
    ]
    if others:
        stats = _pair_stats_many(m, others, opts)
        if all(_good_from_stats(s, opts) for s in stats):
            return False
    alt = try_locate(m, frame, bad, reg_opts,
                     min_corr=opts.loop_min_correspondences)
    if alt is None:
        return False
    q_alt, t_alt, assoc = alt
    # The alt hypothesis must satisfy the epipolar geometry of ITS OWN
    # camp — a planar-PnP mirror pose can collect inliers by reprojection
    # yet be geometrically wrong, and feeding it to the pose graph as a
    # loop edge wrecks the correction instead of delivering it.
    alt_pairs = []
    for pid in m.frame_pairs_of[frame]:
        id1, id2, matches = m.pairs[pid]
        other = id2 if id1 == frame else id1
        if other in bad and len(matches) >= 8:
            alt_pairs.append((id1, id2, matches))
    if alt_pairs:
        stats = _pair_stats_many(
            m, alt_pairs, opts, pose_override={frame: (q_alt, t_alt)}
        )
        n_ok = sum(1 for s in stats if _good_from_stats(s, opts))
        if n_ok < 0.5 * len(alt_pairs):
            return False
    c_cur = G.pose_center_np(m.q[frame], m.t[frame])
    c_alt = G.pose_center_np(q_alt, t_alt)
    neigh, _counts = m.covisible_frames(frame, min_shared=1)
    baselines = [
        float(np.linalg.norm(
            G.pose_center_np(m.q[int(f2)], m.t[int(f2)]) - c_cur
        ))
        for f2 in neigh[:8]
    ]
    th = opts.hypothesis_dist_th
    if baselines:
        th = min(th, opts.hypothesis_dist_rel * float(np.median(baselines)))
    if np.linalg.norm(c_cur - c_alt) <= th:
        return False
    import os as _os

    if _os.environ.get("XRSFM_DUMP_CORRECTION_SNAPSHOT"):
        from ..base import snapshot as _snap

        _snap.save_snapshot(
            m, _os.environ["XRSFM_DUMP_CORRECTION_SNAPSHOT"]
            + f".pre.frame{frame}.npz"
        )
        np.savez(
            _os.environ["XRSFM_DUMP_CORRECTION_SNAPSHOT"]
            + f".alt.frame{frame}.npz",
            q_alt=q_alt, t_alt=t_alt, bad=np.asarray(bad),
        )
    corrected = correct_loop(m, frame, q_alt, t_alt, bad, opts)
    if corrected:
        from . import ba_glue

        # Merge duplicate tracks across the loop by keypoint identity
        # (reference: MergeTrackLoop, error_corrector.cc:144-185) plus
        # gate-free fusion through the verified matches of every pair the
        # current geometry disagrees with — the loop bridges — so BA has
        # the cross-loop constraint votes it needs to leave the drift
        # basin.
        n_fused = merge_track_loop(m, frame, assoc, bad)
        n_fused += fuse_inconsistent_pair_tracks(m, opts)
        all_tracks = np.nonzero(m.track_valid[: m.num_tracks])[0]
        triangulate.retriangulate(m, all_tracks)
        # The reference follows with keyframe GBA (KGBA,
        # error_corrector.cc:230-241); a FULL precise GBA is used here —
        # a loop correction is a global, ill-conditioned perturbation
        # where the keyframe reduction and bf16 Schur products both cost
        # convergence, and it is a rare event so the accurate profile is
        # affordable.
        import os as _os

        if _os.environ.get("XRSFM_DUMP_CORRECTION_SNAPSHOT"):
            from ..base import snapshot as _snap

            _snap.save_snapshot(
                m, _os.environ["XRSFM_DUMP_CORRECTION_SNAPSHOT"]
                + f".frame{frame}.npz"
            )
        reg = [int(f) for f in np.nonzero(m.registered)[0]]
        # two LM rounds: each run_ba restarts the damping at lam_init,
        # which is what lets the solver leave the high-lambda plateau the
        # pose-graph perturbation parks it on (a single longer run stays
        # trapped — measured 5.3M -> 2.2M in one 60-iter round vs -> 180k
        # with a restart)
        for _round in range(2):
            g1 = ba_glue.run_ba(
                m, reg, BAOptions(max_iters=60, huber_px=4.0, precise=True)
            )
        if g1:
            print(f"[mapper] post-correction GBA: {g1.initial_cost:.1f} -> "
                  f"{g1.final_cost:.1f}", flush=True)
        triangulate.filter_tracks(m, None, tri_opts)
        # with geometry now corrected, remaining duplicates pass the
        # ordinary reprojection merge gate — global sweep, then re-solve
        n_fused += triangulate.merge_all_tracks(m, None, tri_opts)
        all_tracks = np.nonzero(m.track_valid[: m.num_tracks])[0]
        triangulate.retriangulate(m, all_tracks)
        print(f"[mapper] loop merge: {n_fused} cross-loop tracks fused",
              flush=True)
        for _round in range(2):
            g2 = ba_glue.run_ba(
                m, reg, BAOptions(max_iters=60, huber_px=4.0, precise=True)
            )
        if g2:
            print(f"[mapper] post-sweep GBA: {g2.initial_cost:.1f} -> "
                  f"{g2.final_cost:.1f}", flush=True)
        triangulate.filter_tracks(m, None, tri_opts)
    return corrected
