"""Keyframe selection, keyframe-only global BA (KGBA), ref-frame update.

(reference: Map::KeyFrameSelection src/base/map.cc:428-640,
Map::UpdateByRefFrame :642-663, BASolver::KGBA
src/optimization/ba_solver.cc:640-678)

The reference demotes a keyframe when it is redundant — >= 200
observations of which >= 60% are seen >= 3x by other keyframes — and
re-anchors demoted frames to a covisible keyframe by a stored relative
pose; KGBA then optimizes only the keyframes and propagates.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from . import ba_glue, triangulate
from ..base.map import SfMMap
from ..optim.ba import BAOptions
from ..utils import geometry as G

# reference thresholds (base/map.cc:428-640)
_MIN_OBS_DEMOTE = 200
_REDUNDANT_RATIO = 0.6
_SEEN_BY_OTHERS = 3


def _ensure_fields(m: SfMMap):
    if not hasattr(m, "is_keyframe"):
        m.is_keyframe = np.ones(m.num_frames, bool)
        m.ref_frame = np.full(m.num_frames, -1, np.int64)
        m.ref_rel_q = np.zeros((m.num_frames, 4))
        m.ref_rel_q[:, 0] = 1.0
        m.ref_rel_t = np.zeros((m.num_frames, 3))
    elif len(m.is_keyframe) < m.num_frames:
        extra = m.num_frames - len(m.is_keyframe)
        m.is_keyframe = np.append(m.is_keyframe, np.ones(extra, bool))
        m.ref_frame = np.append(m.ref_frame, np.full(extra, -1, np.int64))
        q = np.zeros((extra, 4))
        q[:, 0] = 1.0
        m.ref_rel_q = np.vstack([m.ref_rel_q, q])
        m.ref_rel_t = np.vstack([m.ref_rel_t, np.zeros((extra, 3))])


def keyframe_selection(m: SfMMap) -> int:
    """Demote redundant keyframes.  Returns number of demotions.

    Vectorized: per-track keyframe-observation counts come from one
    bincount over the COO observation table, updated incrementally as
    frames are demoted (the reference's sequential semantics — each
    demotion affects later redundancy checks — are preserved)."""
    _ensure_fields(m)
    demoted = 0
    # per-track count of observations from registered keyframes
    n = m.num_obs_slots
    ot = m.obs_track[:n]
    of = m.obs_frame[:n]
    kf_obs = (ot >= 0) & m.registered[of] & m.is_keyframe[of]
    per_track_kf = np.bincount(ot[kf_obs], minlength=m.num_tracks)
    for f in range(m.num_frames):
        if not m.registered[f] or not m.is_keyframe[f]:
            continue
        p2d, tids = m.frame_observations(f)
        if len(p2d) < _MIN_OBS_DEMOTE:
            continue
        # f itself is a registered keyframe here, so subtract its own obs
        seen_by_others = per_track_kf[tids] - 1
        redundant = int(np.count_nonzero(seen_by_others >= _SEEN_BY_OTHERS))
        if redundant < _REDUNDANT_RATIO * len(p2d):
            continue
        # pick the covisible keyframe with most shared tracks as reference
        neigh, counts = m.covisible_frames(f)
        ref = -1
        for f2, c in zip(neigh, counts):
            if m.is_keyframe[f2] and f2 != f:
                ref = int(f2)
                break
        if ref < 0:
            continue
        m.is_keyframe[f] = False
        m.ref_frame[f] = ref
        _store_rel_pose(m, f, ref)
        demoted += 1
        np.subtract.at(per_track_kf, tids, 1)  # f's obs no longer keyframe
    # re-anchor any existing non-keyframes to current keyframe poses
    for f in range(m.num_frames):
        if m.registered[f] and not m.is_keyframe[f] and m.ref_frame[f] >= 0:
            _store_rel_pose(m, f, int(m.ref_frame[f]))
    return demoted


def _store_rel_pose(m: SfMMap, f: int, ref: int):
    # host numpy: a device call here costs a tunnel round-trip per frame
    q_rel, t_rel = G.pose_relative_np(m.q[f], m.t[f], m.q[ref], m.t[ref])
    m.ref_rel_q[f] = q_rel
    m.ref_rel_t[f] = t_rel


def update_by_ref_frame(m: SfMMap):
    """Re-anchor non-keyframes after their reference keyframes moved
    (reference: UpdateByRefFrame, base/map.cc:642-663)."""
    _ensure_fields(m)
    for f in range(m.num_frames):
        if not m.registered[f] or m.is_keyframe[f] or m.ref_frame[f] < 0:
            continue
        ref = int(m.ref_frame[f])
        q, t = G.pose_compose_np(
            m.ref_rel_q[f], m.ref_rel_t[f], m.q[ref], m.t[ref]
        )
        m.q[f] = q
        m.t[f] = t


def kgba(
    m: SfMMap,
    opts: BAOptions = BAOptions(max_iters=20, huber_px=4.0),
    tri_opts: Optional[triangulate.TriOptions] = None,
    optimize_intrinsics: bool = False,
):
    """Keyframe global BA + non-keyframe propagation
    (reference: BASolver::KGBA, ba_solver.cc:640-678)."""
    _ensure_fields(m)
    keyframe_selection(m)
    keyframes = [
        f for f in range(m.num_frames) if m.registered[f] and m.is_keyframe[f]
    ]
    if len(keyframes) < 2:
        return None
    res = ba_glue.run_ba(m, keyframes, opts, obs_frames=keyframes,
                         optimize_intrinsics=optimize_intrinsics)
    update_by_ref_frame(m)
    if tri_opts is not None:
        triangulate.filter_tracks(m, None, tri_opts)
    return res
