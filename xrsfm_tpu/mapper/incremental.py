"""The incremental SfM main loop.

(reference: IncrementalMapper::Reconstruct,
src/mapper/incremental_mapper.cc:6-98 — init pair, GBA, then per frame:
select next, register, triangulate, filter, merge, LBA, periodic KGBA)

The outer loop is host Python (inherently sequential — the next frame
depends on map state, SURVEY.md §7.3); every numeric step inside is a
batched jitted device call.
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np

from . import ba_glue, initialize, register, triangulate
from ..base.map import SfMMap
from ..optim.ba import BAOptions
from ..utils import geometry as G


@dataclasses.dataclass
class MapperOptions:
    init: initialize.InitOptions = dataclasses.field(
        default_factory=initialize.InitOptions
    )
    reg: register.RegisterOptions = dataclasses.field(
        default_factory=register.RegisterOptions
    )
    tri: triangulate.TriOptions = dataclasses.field(
        default_factory=triangulate.TriOptions
    )
    # reference defaults: th_rpe_lba 16, th_rpe_gba 16 (incremental_mapper.h)
    # drift/loop error correction (reference: correct_pose option,
    # incremental_mapper.h:14-24; enabled for KITTI)
    correct_pose: bool = False
    lba_iters: int = 5
    gba_iters: int = 20
    lba_frames: int = 5  # covisibility neighbors included in LBA
    gba_growth: float = 1.2  # periodic GBA trigger (incremental_mapper.cc:77)
    # global rotation-averaging polish before the final GBA
    # (optim/rot_avg).  OFF by default: on sequential scenes the 2-view
    # measurement bias (~0.1-0.3 deg/edge, contamination surviving the
    # epipolar gate clusters near the epipole under forward motion)
    # accumulates over the chain to worse than the map's own drift —
    # measured on the 250-frame kitti-class circuit.  Useful on
    # short-graph-diameter unordered scenes.
    rot_avg_polish: bool = False
    # FULL global pose polish (rotation averaging + robust translation
    # recovery from measured pair directions, optim/global_pose.py) —
    # supersedes rot_avg_polish; measured on the 250-frame circuit:
    # final ATE 2.30% -> 1.56% (the drift basin BA cannot leave).
    global_polish: bool = False
    stop_when_register_fail: bool = False
    min_visible: int = 20
    # last-resort visibility/correspondence floor for loop anchors that
    # reach the map through a single cross-junction pair (the reference's
    # TryLocate registers from 12, pnp.cc:133-168)
    min_visible_floor: int = 12
    # free camera intrinsics in global BA (reference: GBA frees
    # camera_param, ba_solver.cc:330-356; LBA always pins it :389).
    # Enabled by rec_1dsfm (noisy per-image EXIF focals, unknown
    # distortion, rec_1dsfm.cc:46-55); off for calibrated pipelines.
    refine_intrinsics: bool = False
    # register up to this many covisibility-ready frames in ONE device
    # dispatch per outer iteration (SURVEY §7.3; the reference registers
    # one frame at a time — MaxPoint3dFrameId).  1 = sequential.
    batch_registration: int = 8
    # scale-out: shard GBA/KGBA over this many devices (jax.devices();
    # 1 = single-device).  Global solves — pose-only AND intrinsics-
    # refining — route through parallel/dist_ba; LBA stays local
    # (small problems, dispatch-bound).
    n_devices: int = 1
    init_id1: int = -1
    init_id2: int = -1
    verbose: bool = True
    # mid-run checkpointing (base/snapshot.py): save the full mapper
    # state every N successful registrations; 0 disables
    snapshot_every: int = 0
    snapshot_path: str = ""
    # stop after N successful registrations (0 = unlimited) — bounded
    # incremental runs for testing and staged pipelines
    max_registrations: int = 0


def polish_backup(m: SfMMap):
    """Snapshot every piece of map state the global-polish trial can
    mutate (poses, structure, cameras + derived kps_norm via
    update_camera on restore).  The trial steps are: the pose rewrite
    (optim/global_pose or optim/rot_avg — poses only), retriangulate
    (track_xyz/track_angle), and GBA rounds (poses, points, cameras).
    None of them add/remove observations or touch registered flags —
    tests/test_incremental.py::test_polish_revert_is_lossless asserts a
    restore is bit-identical over the FULL map state."""
    nt = m.num_tracks
    return (
        nt,
        m.q.copy(), m.t.copy(),
        m.track_xyz[:nt].copy(), m.track_valid[:nt].copy(),
        m.track_error[:nt].copy(), m.track_angle[:nt].copy(),
        {cid: np.array(p) for cid, p in m.cameras.items()},
    )


def polish_restore(m: SfMMap, backup):
    nt, q_b, t_b, xyz_b, val_b, err_b, ang_b, cams_b = backup
    m.q[:] = q_b
    m.t[:] = t_b
    m.track_xyz[:nt] = xyz_b
    m.track_valid[:nt] = val_b
    m.track_error[:nt] = err_b
    m.track_angle[:nt] = ang_b
    for cid, params in cams_b.items():
        m.update_camera(cid, params)


@dataclasses.dataclass
class MapperStats:
    registered: int = 0
    failed: int = 0
    tracks: int = 0
    corrections: int = 0
    time_init: float = 0.0
    time_select: float = 0.0
    time_register: float = 0.0
    time_consistency: float = 0.0
    time_triangulate: float = 0.0
    time_filter: float = 0.0
    time_check: float = 0.0
    time_merge: float = 0.0
    time_lba: float = 0.0
    time_gba: float = 0.0
    time_total: float = 0.0


class IncrementalMapper:
    def __init__(self, opts: MapperOptions = MapperOptions()):
        self.opts = opts
        self.stats = MapperStats()
        self._rejections = {}
        self._intri_gba_warm = False
        self._mesh_cached = None

    def _log(self, msg: str):
        if self.opts.verbose:
            print(f"[mapper] {msg}", flush=True)

    def _bound_jit_footprint(self, n_reg: int, force: bool = False):
        """Release accumulated compiled executables on long CPU runs.

        The XLA:CPU JIT keeps every compiled variant's code sections
        mapped for the process lifetime; a reference-scale reconstruction
        (hundreds of frames -> hundreds of bucketed shapes across
        register/triangulate/LBA/KGBA) eventually exhausts the JIT's
        contiguous section memory and aborts with "LLVM ERROR: Unable to
        allocate section memory!" (observed at the final polish of a
        500+500-frame 1DSfM run; the in-suite variant of the same
        accumulation is why the big e2e tests run in fresh subprocesses,
        tests/test_scale.py).  Dropping the caches unloads dead variants;
        live shapes reload from the persistent compilation cache in
        seconds.  Gated to large CPU runs: small scenes never hit the
        limit and the reload cost would dominate their wall."""
        import jax

        if jax.default_backend() != "cpu" or n_reg < 256:
            return
        self._gba_clears = getattr(self, "_gba_clears", 0) + 1
        if force or self._gba_clears % 3 == 0:
            jax.clear_caches()
            self._log("cleared XLA executable caches (CPU section-memory"
                      " bound)")

    def _mesh(self):
        """Build (once) the scale-out mesh for global solves."""
        if self.opts.n_devices <= 1:
            return None
        if self.__dict__.get("_mesh_cached") is None:
            import jax
            from jax.sharding import Mesh

            devs = jax.devices()
            if len(devs) < self.opts.n_devices:
                self._log(
                    f"n_devices={self.opts.n_devices} requested but only "
                    f"{len(devs)} devices visible — running single-device"
                )
                self._mesh_cached = False
            else:
                self._mesh_cached = Mesh(
                    np.array(devs[: self.opts.n_devices]),
                    axis_names=("obs",),
                )
        return self._mesh_cached or None

    def reconstruct(self, m: SfMMap) -> bool:
        o = self.opts
        t_start = time.time()
        n_reg0 = int(np.count_nonzero(m.registered))
        if m.init_id1 >= 0 and n_reg0 >= 2:
            # resumed from a snapshot: the map is already initialized
            self._log(f"resuming with {n_reg0} registered frames")
        else:
            if not initialize.find_and_initialize(
                m, o.init, o.init_id1, o.init_id2
            ):
                self._log("initialization failed")
                return False
            self._log(
                f"initialized with pair ({m.init_id1}, {m.init_id2}), "
                f"{m.num_tracks} tracks"
            )
            ba_glue.run_ba(
                m,
                [m.init_id1, m.init_id2],
                BAOptions(max_iters=o.gba_iters, huber_px=4.0),
            )
        self.stats.time_init = time.time() - t_start

        num_reg_at_gba = max(2, n_reg0)
        # Growth + polish, with ONE resurrection round: after a global
        # pose polish rewrites the map into a self-consistent geometry,
        # frames that died at drift junctions (epipolar-inconsistent
        # camps on a long circuit — measured on a 1000-frame circuit
        # where both junctions failed and 513 frames starved behind
        # them) register cleanly against the polished map.
        for _growth_round in range(2):
            num_reg_at_gba = max(2, n_reg0)
            stop = False
            while not stop:
                t0 = time.time()
                reg_opts = o.reg
                batch = m.ready_frames(
                    o.min_visible, max_batch=max(1, o.batch_registration)
                )
                if len(batch) == 0 and o.min_visible > o.min_visible_floor:
                    # Last resort: no frame meets min_visible, but a loop
                    # anchor may still be reachable through a single
                    # cross-junction pair (e.g. the far end of a circuit
                    # whose only link to the map is ~40 matches with one
                    # early frame — below the default gate).  Attempt the
                    # single best frame with relaxed thresholds; the
                    # epipolar-consistency check and the bounded retry
                    # counter gate bad poses (reference analogue: TryLocate
                    # registers loop frames from 12 correspondences,
                    # pnp.cc:133-168).
                    batch = m.ready_frames(o.min_visible_floor, max_batch=1)
                    if len(batch):
                        reg_opts = dataclasses.replace(
                            o.reg,
                            min_correspondences=o.min_visible_floor,
                        )
                self.stats.time_select += time.time() - t0
                if len(batch) == 0:
                    break
                t0 = time.time()
                results = register.register_frames_batch(
                    m, batch, reg_opts, seed_salts=self._rejections
                )
                self.stats.time_register += time.time() - t0

                accepted = []
                for nxt in (int(f) for f in batch):
                    ok, n_inl, n_cand = results[nxt]
                    if not ok:
                        # Retry later rather than blacklisting on the first
                        # failure: the reference revisits registration
                        # candidates as the map matures (RegisterNextImage
                        # keeps frames in the candidate pool), and a frontier
                        # frame attempted with 1-2 registered neighbors often
                        # succeeds once its successors add tracks.  A
                        # permanently-dead frontier frame starves every frame
                        # behind it (measured: one weak frame killed the last
                        # 339 frames of a 1000-frame circuit).
                        self._rejections[nxt] = self._rejections.get(nxt, 0) + 1
                        if self._rejections[nxt] >= 3:
                            m.registered_fail[nxt] = True
                            self.stats.failed += 1
                        self._log(
                            f"register frame {nxt} FAILED "
                            f"({n_inl}/{n_cand} inliers, "
                            f"attempt {self._rejections[nxt]})"
                        )
                        if o.stop_when_register_fail and m.registered_fail[nxt]:
                            stop = True
                            break
                        continue
                    from . import error_correct as EC

                    t0 = time.time()
                    consistent = EC.registration_is_consistent(m, nxt)
                    self.stats.time_consistency += time.time() - t0
                    checked_correction = False
                    if not consistent and o.correct_pose:
                        # An epipolar-inconsistent pose at a well-matched frame
                        # is the loop-closure signature: the PnP pose (drifted
                        # camp) disagrees with the other camp's epipolar
                        # geometry.  The reference routes this into
                        # CheckAndCorrectPose (error_corrector.cc:187-246)
                        # rather than rejecting — dropping the frame would
                        # leave the map a chain that no amount of BA can
                        # de-drift.
                        t0 = time.time()
                        if EC.check_and_correct_pose(
                            m, nxt, reg_opts=o.reg, tri_opts=o.tri
                        ):
                            self._log(f"frame {nxt}: loop error corrected")
                            self.stats.corrections += 1
                            consistent = True
                            self._post_correction_amnesty(m)
                        else:
                            consistent = EC.registration_is_consistent(m, nxt)
                        self.stats.time_check += time.time() - t0
                        checked_correction = True
                    if not consistent:
                        # planar-PnP ambiguity / bad registration: undo; retry
                        # once later (more tracks may disambiguate), then fail
                        m.deregister_frame(nxt)
                        self._rejections[nxt] = self._rejections.get(nxt, 0) + 1
                        if self._rejections[nxt] >= 2:
                            m.registered_fail[nxt] = True
                            self.stats.failed += 1
                        self._log(
                            f"register frame {nxt} REJECTED (epipolar-"
                            f"inconsistent pose, attempt {self._rejections[nxt]})"
                        )
                        if o.stop_when_register_fail and m.registered_fail[nxt]:
                            stop = True
                            break
                        continue
                    self.stats.registered += 1

                    if o.correct_pose and not checked_correction:
                        t0 = time.time()
                        if EC.check_and_correct_pose(
                            m, nxt, reg_opts=o.reg, tri_opts=o.tri
                        ):
                            self._log(f"frame {nxt}: loop error corrected")
                            self.stats.corrections += 1
                            self._post_correction_amnesty(m)
                        self.stats.time_check += time.time() - t0

                    t0 = time.time()
                    n_new, n_ext = triangulate.triangulate_frame(m, nxt, o.tri)
                    self.stats.time_triangulate += time.time() - t0

                    t0 = time.time()
                    tri_ids = [
                        int(t) for t in np.unique(m.track_of[nxt]) if t >= 0
                    ]
                    triangulate.filter_tracks(m, tri_ids, o.tri)
                    self.stats.time_filter += time.time() - t0

                    t0 = time.time()
                    n_merged = triangulate.merge_frame_tracks(m, nxt, o.tri)
                    self.stats.time_merge += time.time() - t0
                    accepted.append(nxt)
                    self._log(
                        f"frame {nxt}: +{n_new} tracks, {n_ext} extended, "
                        f"{n_merged} merged, {results[nxt][1]} pnp inliers"
                    )
                    if (o.max_registrations
                            and self.stats.registered >= o.max_registrations):
                        stop = True
                        break

                if accepted:
                    # Refresh low-parallax tracks of the batch's frames with a
                    # full-baseline re-triangulation (ONE dispatch).  Points
                    # keep their creation-time depth until BA frees them, and
                    # a depth fitted from a short forward-motion window is
                    # biased ~0.1-0.2% short; registering the next frame
                    # against biased depths shrinks the step, which shrinks
                    # the next baseline — measured on a 1000-frame circuit,
                    # the compounding collapsed map scale to 1% of truth by
                    # frame 650 and starved registration.  Re-fitting from
                    # the spread of each track's observations removes the
                    # bias as soon as the baseline exists (reference:
                    # ReTriangulate, track_processor.cc:373-424, plus its
                    # angle-aware FindLocalBundle, ba_solver.cc:393-493).
                    t0 = time.time()
                    fresh = set()
                    nt = m.num_tracks
                    for nxt in accepted:
                        t_ids = m.track_of[nxt]
                        t_ids = t_ids[t_ids >= 0]
                        low = t_ids[
                            m.track_angle[t_ids] < np.deg2rad(10.0)
                        ]
                        fresh.update(int(t) for t in low)
                    if fresh:
                        triangulate.retriangulate(
                            m, sorted(fresh), o.tri
                        )
                    self.stats.time_triangulate += time.time() - t0

                    # one LBA over the union of the batch's local bundles
                    # (the reference runs LBA once per single registration)
                    t0 = time.time()
                    local = []
                    seen = set()
                    for nxt in accepted:
                        for f in self._local_frames(m, nxt):
                            if f not in seen:
                                seen.add(f)
                                local.append(f)
                    # LBA problem bounded like the reference's SetUpLBA
                    # (ba_solver.cc:358-391): residuals come from LOCAL frames
                    # only (no frozen observer fan-in), and points are frozen
                    # unless newly observed and still poorly triangulated.
                    # (The reference compares angle_ [radians] against 5 —
                    # never true — so its effective rule is "frozen unless
                    # observed by the new frame"; we implement the intended
                    # 5-degree gate as well.)
                    nt = m.num_tracks
                    far = m.track_angle[:nt] > np.deg2rad(5.0)
                    new_obs = np.zeros(nt, bool)
                    for nxt in accepted:
                        t_ids = m.track_of[nxt]
                        new_obs[t_ids[t_ids >= 0]] = True
                    ba_glue.run_ba(
                        m, local, BAOptions(max_iters=o.lba_iters, huber_px=4.0),
                        obs_frames=local, freeze_tracks=far | ~new_obs,
                    )
                    self.stats.time_lba += time.time() - t0

                n_reg = int(np.count_nonzero(m.registered))
                if accepted:
                    self._log(
                        f"batch of {len(batch)}: {len(accepted)} accepted, "
                        f"reg {n_reg}"
                    )

                if n_reg >= o.gba_growth * num_reg_at_gba:
                    t0 = time.time()
                    from . import keyframe as KF

                    if o.refine_intrinsics and not self._intri_gba_warm:
                        # Graduated non-convexity for the FIRST intrinsics
                        # GBA: with EXIF-grade focal errors most residuals sit
                        # beyond the Huber knee, IRLS crushes the gradient and
                        # LM stalls in a high-cost plateau (measured on the
                        # 80-frame plaza: 30 iters at huber 4 leave cost at
                        # 245k vs 6.4k when the first solve runs effectively
                        # unrobust).  One wide-knee pass precedes the normal
                        # robust solve; contamination is still bounded by the
                        # knee, just at a coarser scale.
                        self._intri_gba_warm = True
                        KF.kgba(
                            m,
                            BAOptions(max_iters=o.gba_iters, huber_px=32.0),
                            tri_opts=None,
                            optimize_intrinsics=True,
                        )
                    gres = KF.kgba(
                        m,
                        BAOptions(max_iters=o.gba_iters, huber_px=4.0),
                        tri_opts=o.tri,
                        optimize_intrinsics=o.refine_intrinsics,
                        mesh=self._mesh(),
                    )
                    self.stats.time_gba += time.time() - t0
                    num_reg_at_gba = n_reg
                    self._bound_jit_footprint(n_reg)
                    if gres is not None:
                        self._log(
                            f"KGBA over {n_reg} frames: cost "
                            f"{gres.initial_cost:.1f} -> {gres.final_cost:.1f}"
                        )
                    if o.refine_intrinsics:
                        # refined cameras + structure invalidate earlier
                        # registration failures (they were judged under the
                        # old intrinsics) — same rationale as the loop-
                        # correction amnesty
                        self._post_correction_amnesty(m)

                if (o.snapshot_every and o.snapshot_path and accepted
                        and self.stats.registered % o.snapshot_every
                        < len(accepted)):
                    from ..base import snapshot as SNAP

                    SNAP.save_snapshot(m, o.snapshot_path)
                if o.max_registrations and self.stats.registered >= o.max_registrations:
                    self._log(
                        f"stopping after {self.stats.registered} registrations "
                        f"(max_registrations)"
                    )
                    stop = True

            # final polish: rot-avg -> GBA -> filter -> merge sweep ->
            # retriangulate -> GBA
            reg_frames = list(np.nonzero(m.registered)[0])
            rotated = False
            if len(reg_frames) >= 2:
                # the final polish compiles several fresh large-shape
                # solves; start it with a drained executable arena
                self._bound_jit_footprint(len(reg_frames), force=True)
                t0 = time.time()
                want_polish = (
                    (o.global_polish or o.rot_avg_polish)
                    and len(reg_frames) >= 10
                )
                # after loop corrections the polish problem is ill-conditioned:
                # full-precision Schur products and a damping restart round
                # (each run_ba re-inits lam) are what let LM leave the
                # high-lambda plateau the correction parks it on.  The pre
                # side settles a map the growth loop already refined, so it
                # derives `hard` from corrections only and skips the
                # intrinsics wide-knee schedule (the post side re-runs it
                # because the pose rewrite invalidates the intrinsics
                # basin) — roughly halving discarded-wall when the gate
                # reverts (advisor r3).
                hard = self.stats.corrections > 0 or want_polish

                def _polish_gba_rounds(tag, schedule_intrinsics, hard):
                    if schedule_intrinsics:
                        # wide-knee first pass (see the first-KGBA graduated
                        # schedule above) so late-registered cameras'
                        # intrinsics can still reach the global basin, then
                        # robust rounds — each run_ba restarts lam, which
                        # escapes the high-lambda plateaus the slow focal/k1
                        # directions park LM on (measured: 3 restarts 4.2%
                        # -> 1.9% median focal error where one long solve
                        # stalls at ~4%)
                        ba_glue.run_ba(
                            m, reg_frames,
                            BAOptions(max_iters=o.gba_iters, huber_px=32.0),
                            optimize_intrinsics=True,
                        )
                        for _r in range(2):
                            ba_glue.run_ba(
                                m, reg_frames,
                                BAOptions(max_iters=o.gba_iters, huber_px=4.0),
                                optimize_intrinsics=True,
                            )
                    polish = BAOptions(
                        max_iters=2 * self.opts.gba_iters, huber_px=4.0,
                        precise=hard,
                    )
                    pres = None
                    for _round in range(2 if hard else 1):
                        pres = ba_glue.run_ba(
                            m, reg_frames, polish,
                            optimize_intrinsics=o.refine_intrinsics,
                            mesh=self._mesh())
                        if pres is not None:
                            self._log(
                                f"polish GBA {tag} round {_round}: cost "
                                f"{pres.initial_cost:.1f} -> "
                                f"{pres.final_cost:.1f}"
                            )
                    return pres

                # TRIAL-GATED global polish.  The measured-pair pose
                # rewrite (rotation averaging + translation recovery) is
                # the escape from drift basins BA cannot leave — but its
                # fixed point is set by 2-view measurement noise, and on a
                # map already better than that (measured on the 250-frame
                # circuit: 1.00% ATE drifted vs the polish's 1.18% fixed
                # point) it DEGRADES geometry.  So: settle the current
                # basin first (GBA rounds -> cost_pre), try the rewrite,
                # settle it (-> cost_post), and keep whichever robust
                # cost-per-observation is lower.  Both regimes measured:
                # large drift 63k -> 38.7k accepts, small drift
                # 86.6k -> 95.1k reverts.
                pres_pre = _polish_gba_rounds(
                    "pre", schedule_intrinsics=False,
                    hard=self.stats.corrections > 0,
                )
                cost_pre = (
                    pres_pre.final_cost / max(pres_pre.n_obs, 1)
                    if pres_pre else None
                )
                if want_polish:
                    backup = polish_backup(m)
                    if o.global_polish:
                        # full global pose polish: rotation averaging +
                        # robust translation recovery from measured pair
                        # directions (no reference counterpart;
                        # optim/global_pose.py)
                        from ..optim import global_pose

                        rotated = global_pose.global_pose_polish(
                            m, log=self._log
                        )
                    else:
                        # rotation-only averaging (no reference counterpart
                        # — the reference pose graph never touches
                        # rotations, ba_solver.cc:147)
                        from ..optim import rot_avg

                        rotated = rot_avg.rotation_averaging_polish(
                            m, log=self._log
                        )
                if rotated:
                    # re-triangulate EVERY valid track, not just those the
                    # stale (pre-rewrite) track_error flags: after a global
                    # pose rewrite all stored errors (and positions) refer
                    # to the old geometry, and leaving most points in place
                    # pulls the follow-up GBA back into the old basin (same
                    # reason error_correct.py retriangulates all)
                    triangulate.retriangulate(
                        m,
                        np.nonzero(m.track_valid[: m.num_tracks])[0],
                        o.tri,
                    )
                    pres_post = _polish_gba_rounds(
                        "post", schedule_intrinsics=o.refine_intrinsics,
                        hard=hard,
                    )
                    cost_post = (
                        pres_post.final_cost / max(pres_post.n_obs, 1)
                        if pres_post else None
                    )
                    # obs-loss guard (advisor r3): the post-rewrite
                    # retriangulation invalidates poorly-fitting tracks, so
                    # cost_post averages over a survivor set — a rewrite
                    # that shed its high-residual observations can look
                    # cheaper per observation while the geometry got worse.
                    # Cap the shrinkage the cost comparison may ride on.
                    obs_shrunk = (
                        pres_pre is not None and pres_post is not None
                        and pres_post.n_obs < 0.97 * pres_pre.n_obs
                    )
                    if (
                        cost_pre is not None and cost_post is not None
                        and (cost_post >= cost_pre * 0.995 or obs_shrunk)
                    ):
                        polish_restore(m, backup)
                        rotated = False
                        why = (
                            f"observation set shrank "
                            f"{pres_pre.n_obs} -> {pres_post.n_obs}"
                            if obs_shrunk and cost_post < cost_pre * 0.995
                            else "the map beats the measured-edge fixed point"
                        )
                        self._log(
                            f"global polish REVERTED: cost/obs "
                            f"{cost_post:.4f} vs {cost_pre:.4f} pre — {why}"
                        )
                import dataclasses as _dc

                tight = _dc.replace(self.opts.tri, filter_px=self.opts.tri.polish_px)
                triangulate.filter_tracks(m, None, tight)
                # global merge sweep: duplicates that survived mapping (e.g.
                # the two camps of a closed loop) pass the reprojection gate
                # once GBA has settled the geometry
                triangulate.merge_all_tracks(m, None, self.opts.tri)
                n_rt = triangulate.retriangulate(m, None, self.opts.tri)
                fres = ba_glue.run_ba(
                    m, reg_frames,
                    BAOptions(max_iters=self.opts.gba_iters, huber_px=2.0),
                    optimize_intrinsics=o.refine_intrinsics,
                )
                if fres is not None:
                    self._log(
                        f"polish GBA final: cost "
                        f"{fres.initial_cost:.1f} -> {fres.final_cost:.1f}"
                    )
                triangulate.filter_tracks(m, None, tight)
                self.stats.time_gba += time.time() - t0
                if n_rt:
                    self._log(f"final polish: {n_rt} tracks retriangulated")

            fresh = (~m.registered) & m.registered_fail
            if (_growth_round == 0 and rotated
                    and np.count_nonzero(fresh)):
                self._log(
                    f"resurrection round: {int(np.count_nonzero(fresh))} "
                    f"failed frames retried against the polished map"
                )
                self._post_correction_amnesty(m)
                num_reg_at_gba = max(2, int(np.count_nonzero(m.registered)))
                continue
            break

        self.stats.tracks = int(np.count_nonzero(m.track_valid))
        self.stats.time_total = time.time() - t_start
        s = self.stats
        tracked = (
            s.time_init + s.time_select + s.time_register
            + s.time_consistency + s.time_triangulate + s.time_filter
            + s.time_check + s.time_merge + s.time_lba + s.time_gba
        )
        self._log(
            f"done: {int(np.count_nonzero(m.registered))} registered, "
            f"{s.tracks} tracks, {s.time_total:.1f}s "
            f"(init {s.time_init:.1f} sel {s.time_select:.1f} "
            f"reg {s.time_register:.1f} con {s.time_consistency:.1f} "
            f"tri {s.time_triangulate:.1f} "
            f"fil {s.time_filter:.1f} "
            f"mrg {s.time_merge:.1f} chk {s.time_check:.1f} "
            f"lba {s.time_lba:.1f} "
            f"gba {s.time_gba:.1f} "
            f"other {s.time_total - tracked:.1f})"
        )
        return True

    def _post_correction_amnesty(self, m: SfMMap):
        """After a loop correction rewrites the geometry, frames that
        failed registration against the OLD (drifted) map deserve fresh
        attempts — e.g. the frontier frames a collapsing arm starved
        just before the loop anchor closed the cycle from the other
        side."""
        fresh = (~m.registered) & m.registered_fail
        n = int(np.count_nonzero(fresh))
        if n:
            m.registered_fail[fresh] = False
            for f in np.nonzero(fresh)[0]:
                self._rejections.pop(int(f), None)
            self._log(f"correction amnesty: {n} failed frames retryable")

    def _local_frames(self, m: SfMMap, frame: int):
        """Local bundle = the frame + covisible neighbors chosen for
        covisibility AND baseline (reference: FindLocalBundle,
        ba_solver.cc:393-521, which walks triangulation-angle thresholds
        6°/k to prefer well-separated overlapping images).

        Nearest neighbors alone give a short-baseline bundle that cannot
        observe forward-motion scale drift; half the slots go to the
        most distant (largest-baseline) frames among the well-covisible
        ones, using camera-center distance as the angle proxy."""
        neigh, cnt = m.covisible_frames(frame)
        k = self.opts.lba_frames
        neigh = [int(f) for f in neigh]
        if len(neigh) <= k:
            return [frame] + neigh
        n_near = max(1, k // 2)
        local = [frame] + neigh[:n_near]
        cand = [
            f for f, c in zip(neigh[n_near:], cnt[n_near:])
            if c >= 0.25 * int(cnt[0])
        ]
        if cand:
            c0 = G.pose_center_np(m.q[frame], m.t[frame])
            cc = np.stack([G.pose_center_np(m.q[f], m.t[f]) for f in cand])
            d = np.linalg.norm(cc - c0, axis=1)
            for j in np.argsort(-d)[: k - n_near]:
                local.append(cand[int(j)])
        for f in neigh[n_near:]:
            if len(local) >= k + 1:
                break
            if f not in local:
                local.append(f)
        return local
