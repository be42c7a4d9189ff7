"""Bridge between the host-side SfMMap and the device BA solver.

Builds padded BAProblem pytrees for local / global bundle adjustment and
writes optimized poses/points back (reference equivalents:
BASolver::GBA/LBA set-up, src/optimization/ba_solver.cc:358-638).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from . import kernels
from ..base.map import SfMMap
from ..optim.ba import BAOptions, BAProblem, solve_ba


@dataclasses.dataclass
class BAGlueResult:
    frame_ids: np.ndarray
    track_ids: np.ndarray
    initial_cost: float
    final_cost: float
    iters: int


def _collect(m: SfMMap, opt_frames: Sequence[int], obs_frames=None):
    opt_set = set(int(f) for f in opt_frames)
    allowed = None if obs_frames is None else set(int(f) for f in obs_frames)
    tracks = set()
    for f in opt_set:
        for tid in m.track_of[f]:
            if tid >= 0 and m.track_valid[tid]:
                tracks.add(int(tid))
    # all frames observing those tracks (non-opt ones will be fixed)
    frames = set(opt_set)
    obs_rows = []
    for tid in tracks:
        for f, p in m.track_obs[tid].items():
            if allowed is not None and int(f) not in allowed:
                continue
            frames.add(int(f))
            obs_rows.append((int(f), int(tid), int(p)))
    return sorted(frames), sorted(tracks), obs_rows


def build_problem(
    m: SfMMap,
    opt_frames: Sequence[int],
    fix_all_poses: bool = False,
    gauge_frames: Optional[Sequence[int]] = None,
    obs_frames: Optional[Sequence[int]] = None,
):
    """Build a padded BAProblem.  Frames not in opt_frames (but observing
    shared tracks) enter with frozen poses — the reference holds non-local
    frames constant in LBA the same way (ba_solver.cc:358-391).
    obs_frames restricts which frames contribute observations (KGBA uses
    keyframes only, ba_solver.cc:640-678)."""
    frames, tracks, obs_rows = _collect(m, opt_frames, obs_frames)
    if not obs_rows:
        return None, None, None
    fmap = {f: i for i, f in enumerate(frames)}
    tmap = {t: i for i, t in enumerate(tracks)}

    C = kernels.bucket(len(frames), lo=8)
    P = kernels.bucket(len(tracks), lo=64)
    O = kernels.bucket(len(obs_rows), lo=256)

    cam_q = np.zeros((C, 4), np.float32)
    cam_q[:, 0] = 1.0
    cam_t = np.zeros((C, 3), np.float32)
    cam_intri = np.zeros((C, 8), np.float32)
    cam_intri[:, :2] = 1.0
    fix_cam = np.ones(C, bool)  # padding cameras frozen
    fix_trans = np.zeros(C, bool)
    for f, i in fmap.items():
        cam_q[i] = m.q[f]
        cam_t[i] = m.t[f]
        cam_intri[i] = m.cameras[int(m.cam_of_frame[f])]
        fix_cam[i] = fix_all_poses or (f not in set(int(x) for x in opt_frames))

    points = np.zeros((P, 3), np.float32)
    fix_pt = np.ones(P, bool)
    for t, i in tmap.items():
        points[i] = m.track_xyz[t]
        fix_pt[i] = False

    obs_uv = np.zeros((O, 2), np.float32)
    obs_cam = np.zeros(O, np.int32)
    obs_pt = np.zeros(O, np.int32)
    obs_w = np.zeros(O, np.float32)
    for k, (f, tid, p) in enumerate(obs_rows):
        obs_uv[k] = m.kps[f][p]
        obs_cam[k] = fmap[f]
        obs_pt[k] = tmap[tid]
        obs_w[k] = 1.0

    # gauge: if nothing is frozen yet, freeze the gauge frames' translations
    # and the first gauge frame fully (reference GBA freezes the init-pair
    # translations, ba_solver.cc:610-614)
    if not fix_all_poses and not np.any(fix_cam[: len(frames)]):
        gf = [f for f in (gauge_frames or []) if f in fmap]
        if len(gf) < 2:
            # fall back: two frames with most observations
            cnts = np.bincount(obs_cam[: len(obs_rows)], minlength=C)
            gf = list(np.argsort(-cnts)[:2])
            gf = [frames[int(i)] for i in gf]
        fix_cam[fmap[gf[0]]] = True
        for f in gf[1:2]:
            fix_trans[fmap[f]] = True

    prob = BAProblem(
        cam_q=jnp.asarray(cam_q),
        cam_t=jnp.asarray(cam_t),
        cam_intri=jnp.asarray(cam_intri),
        points=jnp.asarray(points),
        obs_uv=jnp.asarray(obs_uv),
        obs_cam=jnp.asarray(obs_cam),
        obs_pt=jnp.asarray(obs_pt),
        obs_w=jnp.asarray(obs_w),
        fix_cam=jnp.asarray(fix_cam),
        fix_trans=jnp.asarray(fix_trans),
        fix_pt=jnp.asarray(fix_pt),
    )
    return prob, frames, tracks


def run_ba(
    m: SfMMap,
    opt_frames: Sequence[int],
    opts: BAOptions = BAOptions(),
    fix_all_poses: bool = False,
    obs_frames: Optional[Sequence[int]] = None,
) -> Optional[BAGlueResult]:
    """Build, solve, write back."""
    gauge = [m.init_id1, m.init_id2] if m.init_id1 >= 0 else []
    prob, frames, tracks = build_problem(
        m, opt_frames, fix_all_poses=fix_all_poses, gauge_frames=gauge,
        obs_frames=obs_frames,
    )
    if prob is None:
        return None
    sol, info = solve_ba(prob, opts)
    q = np.asarray(sol.cam_q, np.float64)
    t = np.asarray(sol.cam_t, np.float64)
    pts = np.asarray(sol.points, np.float64)
    for i, f in enumerate(frames):
        if not bool(prob.fix_cam[i]):
            m.q[f] = q[i] / np.linalg.norm(q[i])
            m.t[f] = t[i]
    for i, tid in enumerate(tracks):
        m.track_xyz[tid] = pts[i]
    return BAGlueResult(
        frame_ids=np.asarray(frames),
        track_ids=np.asarray(tracks),
        initial_cost=float(info["initial_cost"]),
        final_cost=float(info["final_cost"]),
        iters=int(info["iters"]),
    )
