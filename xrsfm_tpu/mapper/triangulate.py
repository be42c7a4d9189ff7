"""Track processing: per-frame triangulation, filtering, merging.

(reference: Point3dProcessor, src/geometry/track_processor.cc —
TriangulateFramePoint :187-251, CreatePoint3d1 :109-161, Filter* :280-349,
MergeTrack(s) :458-618, ContinueFrameTracks :651-680)
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax.numpy as jnp
import numpy as np

from . import kernels
from ..base.map import SfMMap


@dataclasses.dataclass
class TriOptions:
    tri_px: float = 8.0  # reference: TriangulateFramePoint(8.0)
    filter_px: float = 16.0  # reference: th_rpe_gba default 16
    min_angle_deg: float = 1.5  # reference: th_angle defaults
    max_views: int = 16
    min_depth: float = 1e-3
    max_depth: float = 1e3


def _focal(m: SfMMap, frame: int) -> float:
    return float(m.cameras[int(m.cam_of_frame[frame])][0])


def triangulate_frame(m: SfMMap, frame: int, opts: TriOptions = TriOptions()):
    """Create/extend tracks for the untracked keypoints of a newly
    registered frame.  Returns (n_new_tracks, n_extended)."""
    csr = m.corr[frame]
    focal = _focal(m, frame)
    th = (opts.tri_px / focal) ** 2
    min_angle = np.deg2rad(opts.min_angle_deg)

    extend_p2d: List[int] = []
    extend_tid: List[int] = []
    create_sets: List[List] = []  # [(frame, p2d), ...] per new track

    track_of_frame = m.track_of[frame]
    for p2d in range(len(m.kps[frame])):
        if track_of_frame[p2d] >= 0:
            continue
        of, op = csr.of(p2d)
        if len(of) == 0:
            continue
        reg = m.registered[of]
        of, op = of[reg], op[reg]
        if len(of) == 0:
            continue
        tids = np.array(
            [m.track_of[f2][pp] for f2, pp in zip(of, op)], np.int64
        )
        live = (tids >= 0) & m.track_valid[np.clip(tids, 0, None)]
        if np.any(live):
            # extension candidates: pick the track seen most among corrs
            cand = tids[live]
            vals, cnts = np.unique(cand, return_counts=True)
            extend_p2d.append(p2d)
            extend_tid.append(int(vals[np.argmax(cnts)]))
        else:
            obs = [(frame, p2d)] + [
                (int(f2), int(pp)) for f2, pp in zip(of, op)
            ]
            create_sets.append(obs[: opts.max_views])

    n_ext = _apply_extensions(m, frame, extend_p2d, extend_tid, th)
    n_new = _apply_creations(m, create_sets, th, min_angle, opts.max_views)
    return n_new, n_ext


def _apply_extensions(m: SfMMap, frame: int, p2ds, tids, th) -> int:
    """Continue existing tracks into `frame` when the reprojection fits
    (reference: ContinueTrack, track_processor.cc:426-456)."""
    if not p2ds:
        return 0
    n = len(p2ds)
    b = kernels.bucket(n)
    q = np.broadcast_to(m.q[frame].astype(np.float32), (b, 4))
    t = np.broadcast_to(m.t[frame].astype(np.float32), (b, 3))
    uv = kernels.pad_rows(m.kps_norm[frame][np.asarray(p2ds)], b)
    xyz = kernels.pad_rows(m.track_xyz[np.asarray(tids)].astype(np.float32), b)
    err, z = kernels.reproj_errors_batch(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(uv), jnp.asarray(xyz)
    )
    err = np.asarray(err)[:n]
    z = np.asarray(z)[:n]
    ok = (err < th) & (z > 0)
    cnt = 0
    for k in np.nonzero(ok)[0]:
        tid = int(tids[k])
        if m.track_valid[tid] and frame not in m.track_obs[tid]:
            m.add_observation(tid, frame, int(p2ds[k]))
            cnt += 1
    return cnt


def _apply_creations(m: SfMMap, obs_sets, th, min_angle, max_views) -> int:
    """Robustly triangulate new tracks from correspondence sets
    (reference: CreatePoint3d1, track_processor.cc:109-161)."""
    if not obs_sets:
        return 0
    B = kernels.bucket(len(obs_sets), lo=32)
    V = max_views
    q = np.zeros((B, V, 4), np.float32)
    q[..., 0] = 1.0
    t = np.zeros((B, V, 3), np.float32)
    uv = np.zeros((B, V, 2), np.float32)
    mask = np.zeros((B, V), bool)
    for i, obs in enumerate(obs_sets):
        for j, (f, p) in enumerate(obs):
            q[i, j] = m.q[f]
            t[i, j] = m.t[f]
            uv[i, j] = m.kps_norm[f][p]
            mask[i, j] = True
    xyz, obs_ok, ok, ang = kernels.robust_triangulate(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(uv), jnp.asarray(mask),
        th, min_angle,
    )
    xyz = np.asarray(xyz)
    obs_ok = np.asarray(obs_ok)
    ok = np.asarray(ok)
    ang = np.asarray(ang)
    n_new = 0
    for i, obs in enumerate(obs_sets):
        if not ok[i]:
            continue
        accepted = [
            obs[j] for j in range(len(obs))
            if obs_ok[i, j] and m.track_of[obs[j][0]][obs[j][1]] < 0
        ]
        if len(accepted) < 2:
            continue
        tid = m.new_track(xyz[i])
        m.track_angle[tid] = ang[i]
        for f, p in accepted:
            m.add_observation(tid, f, p)
        n_new += 1
    return n_new


def filter_tracks(m: SfMMap, track_ids=None, opts: TriOptions = TriOptions()):
    """Drop observations with big reprojection error / bad depth, and
    tracks with tiny triangulation angle (reference: FilterPoints3d,
    track_processor.cc:280-349).  Returns (n_obs_removed, n_tracks_removed).
    """
    if track_ids is None:
        track_ids = np.nonzero(m.track_valid[: m.num_tracks])[0]
    track_ids = [int(t) for t in track_ids if m.track_valid[t]]
    if not track_ids:
        return 0, 0
    # flatten observations
    rows = []  # (tid, frame, p2d)
    for tid in track_ids:
        for f, p in m.track_obs[tid].items():
            rows.append((tid, f, p))
    if not rows:
        return 0, 0
    rows = np.asarray(rows, np.int64)
    n = len(rows)
    b = kernels.bucket(n)
    q = kernels.pad_rows(m.q[rows[:, 1]].astype(np.float32), b)
    q[len(rows):, 0] = 1.0
    t = kernels.pad_rows(m.t[rows[:, 1]].astype(np.float32), b)
    uv = kernels.pad_rows(
        np.stack([m.kps_norm[f][p] for _, f, p in rows]).astype(np.float32), b
    )
    xyz = kernels.pad_rows(m.track_xyz[rows[:, 0]].astype(np.float32), b)
    err, z = kernels.reproj_errors_batch(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(uv), jnp.asarray(xyz)
    )
    err = np.asarray(err)[:n]
    z = np.asarray(z)[:n]
    per_frame_focal = np.array([_focal(m, int(f)) for f in rows[:, 1]])
    th = (opts.filter_px / per_frame_focal) ** 2
    bad = (err > th) | (z < opts.min_depth) | (z > opts.max_depth)
    n_rm = 0
    for k in np.nonzero(bad)[0]:
        tid, f, p = int(rows[k, 0]), int(rows[k, 1]), int(rows[k, 2])
        if m.track_valid[tid] and m.track_obs[tid].get(f) == p:
            m.remove_observation(tid, f, p)
            n_rm += 1
    # update stored error stat
    for tid in track_ids:
        if m.track_valid[tid]:
            sel = (rows[:, 0] == tid) & ~bad
            if np.any(sel):
                m.track_error[tid] = float(np.sqrt(np.mean(err[sel])))
    n_tr = sum(1 for tid in track_ids if not m.track_valid[tid])
    return n_rm, n_tr


def merge_frame_tracks(m: SfMMap, frame: int, opts: TriOptions = TriOptions()):
    """Merge track pairs bridged by a correspondence of `frame`
    (reference: MergeTracks, track_processor.cc:520-618).  A merge is
    accepted when every observation of the union reprojects under the
    threshold at the observation-count-weighted mean position."""
    csr = m.corr[frame]
    cand = {}
    for p2d, tid in enumerate(m.track_of[frame]):
        if tid < 0 or not m.track_valid[tid]:
            continue
        of, op = csr.of(p2d)
        for f2, pp in zip(of, op):
            t2 = m.track_of[f2][pp]
            if t2 >= 0 and t2 != tid and m.track_valid[t2]:
                key = (min(int(tid), int(t2)), max(int(tid), int(t2)))
                cand[key] = True
    merged = 0
    for t1, t2 in list(cand.keys()):
        if not (m.track_valid[t1] and m.track_valid[t2]):
            continue
        o1, o2 = m.track_obs[t1], m.track_obs[t2]
        n1, n2 = len(o1), len(o2)
        xyz = (m.track_xyz[t1] * n1 + m.track_xyz[t2] * n2) / (n1 + n2)
        obs = list(o1.items()) + [
            (f, p) for f, p in o2.items() if f not in o1
        ]
        if len(obs) > 32:
            continue
        q = np.stack([m.q[f] for f, _ in obs]).astype(np.float32)
        t = np.stack([m.t[f] for f, _ in obs]).astype(np.float32)
        uv = np.stack([m.kps_norm[f][p] for f, p in obs]).astype(np.float32)
        err, z = kernels.reproj_errors_batch(
            jnp.asarray(q), jnp.asarray(t), jnp.asarray(uv),
            jnp.asarray(np.broadcast_to(xyz.astype(np.float32), (len(obs), 3))),
        )
        focal = _focal(m, frame)
        th = (opts.tri_px / focal) ** 2
        if bool(np.all(np.asarray(err) < th)) and bool(np.all(np.asarray(z) > 0)):
            # merge t2 into t1
            for f, p in list(o2.items()):
                m.remove_observation(t2, f, p)
                if m.track_valid[t1] and f not in m.track_obs[t1]:
                    m.add_observation(t1, f, p)
            if m.track_valid[t2]:
                m.delete_track(t2)
            m.track_xyz[t1] = xyz
            merged += 1
    return merged
