"""Circuit drift-basin experiment harness (CPU).

Decouples global-polish experiments from the ~8-min full pipeline run:

  prep: synth the 250-frame kitti-class circuit, run the incremental
        mapper WITHOUT the global polish (the drifted ~2.3% basin),
        snapshot the final map.
  exp:  load the snapshot, run a polish variant (rotation averaging +
        translation recovery + retriangulate + GBA rounds), print ATE
        and GBA cost after every stage.

Usage:
  python scripts/exp_circuit.py prep <ws>
  python scripts/exp_circuit.py exp <ws> [--rounds N] [--parallax {off,lin,sq}]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def _ate(m, ws):
    from xrsfm_tpu.ops.umeyama import ate_rmse
    from xrsfm_tpu.utils import geometry as G

    gt = {}
    for line in open(os.path.join(ws, "gt_poses.txt")):
        p = line.split()
        gt[p[0]] = (np.array(list(map(float, p[1:5]))),
                    np.array(list(map(float, p[5:8]))))
    reg = np.asarray(m.registered)
    est_c, gt_c = [], []
    for i in range(m.num_frames):
        if not reg[i] or m.names[i] not in gt:
            continue
        est_c.append(G.pose_center_np(np.asarray(m.q[i]), np.asarray(m.t[i])))
        qg, tg = gt[m.names[i]]
        gt_c.append(G.pose_center_np(qg, tg))
    est_c, gt_c = np.asarray(est_c), np.asarray(gt_c)
    span = float(np.linalg.norm(gt_c.max(0) - gt_c.min(0)))
    return float(ate_rmse(gt_c, est_c)), span, len(est_c)


def decompose(ws, snap="drifted.npz"):
    """Per-frame ATE decomposition: WHERE along the circuit does the
    error live, and in which direction?  Aligns sim3, then prints error
    magnitude + the lateral/longitudinal/vertical split per frame block,
    plus per-frame rotation error vs GT.  The r3 verdict's open question
    (weak#6): the remaining ~1% has no identified owner."""
    from xrsfm_tpu.base import snapshot as SNAP
    from xrsfm_tpu.ops.umeyama import umeyama
    from xrsfm_tpu.pipelines.run_reconstruction import build_map
    from xrsfm_tpu.utils import geometry as G

    m = build_map(ws, os.path.join(ws, "camera.txt"))
    if snap:
        SNAP.restore_into(m, os.path.join(ws, snap))
    gt = {}
    for line in open(os.path.join(ws, "gt_poses.txt")):
        p = line.split()
        gt[p[0]] = (np.array(list(map(float, p[1:5]))),
                    np.array(list(map(float, p[5:8]))))
    reg = np.asarray(m.registered)
    idx, est_c, gt_c, rot_err = [], [], [], []
    for i in range(m.num_frames):
        if not reg[i] or m.names[i] not in gt:
            continue
        idx.append(i)
        est_c.append(G.pose_center_np(np.asarray(m.q[i]), np.asarray(m.t[i])))
        qg, tg = gt[m.names[i]]
        gt_c.append(G.pose_center_np(qg, tg))
        Re = G.quat_to_rotmat_np(np.asarray(m.q[i], np.float64))
        Rg = G.quat_to_rotmat_np(np.asarray(qg, np.float64))
        rot_err.append((i, Re, Rg))
    est_c, gt_c = np.asarray(est_c), np.asarray(gt_c)
    s, R, t = umeyama(est_c, gt_c)
    aligned = s * est_c @ R.T + t
    err = aligned - gt_c
    emag = np.linalg.norm(err, axis=1)
    span = float(np.linalg.norm(gt_c.max(0) - gt_c.min(0)))
    # rotation errors, gauge-aligned by the umeyama R
    rerr = []
    for i, Re, Rg in rot_err:
        # aligned world: x_w' = R x_w  =>  R_cam' = R_cam R^T
        dR = (Re @ R.T) @ Rg.T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        rerr.append(ang)
    rerr = np.asarray(rerr)
    # longitudinal = along GT direction of travel; lateral = horizontal
    # perpendicular; vertical = GT y
    d_trav = np.gradient(gt_c, axis=0)
    d_trav /= np.maximum(np.linalg.norm(d_trav, axis=1, keepdims=True), 1e-9)
    up = np.array([0.0, 1.0, 0.0])
    lat = np.cross(up, d_trav)
    lat /= np.maximum(np.linalg.norm(lat, axis=1, keepdims=True), 1e-9)
    e_long = np.abs(np.sum(err * d_trav, axis=1))
    e_lat = np.abs(np.sum(err * lat, axis=1))
    e_vert = np.abs(err[:, 1])
    print(f"ATE {np.sqrt(np.mean(emag**2)):.4f} "
          f"({100*np.sqrt(np.mean(emag**2))/span:.3f}% of span), "
          f"scale {s:.5f}, frames {len(idx)}")
    print(f"rot err: mean {rerr.mean():.3f} deg, max {rerr.max():.3f}")
    print(f"components rms: long {np.sqrt(np.mean(e_long**2)):.4f} "
          f"lat {np.sqrt(np.mean(e_lat**2)):.4f} "
          f"vert {np.sqrt(np.mean(e_vert**2)):.4f}")
    B = 10
    print("frame-block | err_rms  long  lat  vert | rot_deg")
    for b in range(0, len(idx), max(1, len(idx) // B)):
        sl = slice(b, min(b + max(1, len(idx) // B), len(idx)))
        print(f"  {idx[sl.start]:4d}-{idx[sl.stop-1]:4d} | "
              f"{np.sqrt(np.mean(emag[sl]**2)):.4f}  "
              f"{np.sqrt(np.mean(e_long[sl]**2)):.4f} "
              f"{np.sqrt(np.mean(e_lat[sl]**2)):.4f} "
              f"{np.sqrt(np.mean(e_vert[sl]**2)):.4f} | "
              f"{rerr[sl].mean():.3f}")
    np.savez(os.path.join(ws, "decompose.npz"), idx=np.asarray(idx),
             err=err, emag=emag, rerr=rerr, aligned=aligned, gt=gt_c)


def _load_gt(ws):
    gt = {}
    for line in open(os.path.join(ws, "gt_poses.txt")):
        p = line.split()
        gt[p[0]] = (np.array(list(map(float, p[1:5]))),
                    np.array(list(map(float, p[5:8]))))
    return gt


def _settle(m, rounds=3, iters=40):
    """Settle the CURRENT pose/track state: full retriangulate + precise
    GBA rounds.  Returns (final_cost, n_obs)."""
    from xrsfm_tpu.mapper import ba_glue, triangulate
    from xrsfm_tpu.mapper.incremental import MapperOptions
    from xrsfm_tpu.optim.ba import BAOptions

    o = MapperOptions()
    triangulate.retriangulate(
        m, np.nonzero(m.track_valid[: m.num_tracks])[0], o.tri
    )
    reg_frames = list(np.nonzero(m.registered)[0])
    res = None
    for _ in range(rounds):
        res = ba_glue.run_ba(
            m, reg_frames,
            BAOptions(max_iters=iters, huber_px=4.0, precise=True),
        )
    return res.final_cost, res.n_obs


def gt_settle(ws, snap="drifted.npz"):
    """The cost floor question: on the SAME observation/track set, what
    cost does a settle from GT poses reach vs the pipeline's basin?  If
    the two costs coincide while ATE differs 100x, the remaining error is
    a near-null valley mode of this scene's cost surface (analysis
    answer for r3-weak#6); if GT-cost is clearly lower, there is signal
    left and an escape should hunt it."""
    from xrsfm_tpu.base import snapshot as SNAP
    from xrsfm_tpu.pipelines.run_reconstruction import build_map
    from xrsfm_tpu.utils import geometry as G

    m = build_map(ws, os.path.join(ws, "camera.txt"))
    SNAP.restore_into(m, os.path.join(ws, snap))
    c, n = _settle(m)
    ate, span, _ = _ate(m, ws)
    print(f"as-loaded settle: cost {c:.1f} over {n} obs "
          f"({c / max(n, 1):.4f}/obs), ATE {100 * ate / span:.3f}%")

    gt = _load_gt(ws)
    reg = np.asarray(m.registered)
    for i in range(m.num_frames):
        if reg[i] and m.names[i] in gt:
            qg, tg = gt[m.names[i]]
            m.q[i] = qg
            m.t[i] = tg
    c, n = _settle(m)
    ate, span, _ = _ate(m, ws)
    print(f"GT-start settle:  cost {c:.1f} over {n} obs "
          f"({c / max(n, 1):.4f}/obs), ATE {100 * ate / span:.3f}%")


def sweep(ws, snap="drifted.npz", alphas=(0.0, 0.25, 0.5, 0.75, 1.0)):
    """cost(alpha) along the straight path from the settled state to the
    (gauge-aligned) GT poses: interpolate poses, retriangulate, evaluate
    robust cost WITHOUT re-optimizing poses (points free).  A flat curve
    = the error lives in a near-null valley; a barrier = genuine basin
    wall."""
    from xrsfm_tpu.base import snapshot as SNAP
    from xrsfm_tpu.mapper import ba_glue
    from xrsfm_tpu.ops.umeyama import umeyama
    from xrsfm_tpu.optim.ba import BAOptions
    from xrsfm_tpu.pipelines.run_reconstruction import build_map
    from xrsfm_tpu.utils import geometry as G

    m = build_map(ws, os.path.join(ws, "camera.txt"))
    SNAP.restore_into(m, os.path.join(ws, snap))
    _settle(m)
    gt = _load_gt(ws)
    reg = np.nonzero(np.asarray(m.registered))[0]
    q0 = np.array(m.q)
    t0 = np.array(m.t)
    # align GT into the map's gauge (sim3 on centers; rotation applied to
    # the GT rotations as well)
    est_c = np.array([G.pose_center_np(q0[i], t0[i]) for i in reg])
    gt_c = np.array([G.pose_center_np(*gt[m.names[i]]) for i in reg])
    s, R, t = umeyama(gt_c, est_c)  # gt -> est frame
    reg_frames = list(reg)
    for a in alphas:
        for i in reg:
            qg, tg = gt[m.names[i]]
            Rg = G.quat_to_rotmat_np(np.asarray(qg, np.float64))
            cg = s * R @ G.pose_center_np(qg, tg) + t
            Rt = Rg @ R.T  # camera rotation in est gauge
            # slerp-free small-angle interp via log map
            R0 = G.quat_to_rotmat_np(np.asarray(q0[i], np.float64))
            dR = Rt @ R0.T
            ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
            if ang > 1e-9:
                axis = np.array([
                    dR[2, 1] - dR[1, 2], dR[0, 2] - dR[2, 0],
                    dR[1, 0] - dR[0, 1],
                ]) / (2 * np.sin(ang))
                K = np.array([
                    [0, -axis[2], axis[1]],
                    [axis[2], 0, -axis[0]],
                    [-axis[1], axis[0], 0],
                ])
                aa = a * ang
                Ri = (np.eye(3) + np.sin(aa) * K
                      + (1 - np.cos(aa)) * K @ K) @ R0
            else:
                Ri = R0
            c0 = G.pose_center_np(q0[i], t0[i])
            ci = (1 - a) * c0 + a * cg
            m.q[i] = G.rotmat_to_quat_np(Ri)
            m.t[i] = -Ri @ ci
        from xrsfm_tpu.mapper import triangulate
        from xrsfm_tpu.mapper.incremental import MapperOptions

        o = MapperOptions()
        triangulate.retriangulate(
            m, np.nonzero(m.track_valid[: m.num_tracks])[0], o.tri
        )
        # point-only settle (poses frozen): cost of structure at these
        # poses — 2 rounds so the comparison is at settled structure
        res = None
        for _ in range(2):
            res = ba_glue.run_ba(
                m, reg_frames,
                BAOptions(max_iters=25, huber_px=4.0, precise=True),
                fix_all_poses=True,
            )
        ate, span, _ = _ate(m, ws)
        print(f"alpha {a:.2f}: cost {res.final_cost:.1f} "
              f"({res.final_cost / max(res.n_obs, 1):.4f}/obs, "
              f"{res.n_obs} obs), ATE {100 * ate / span:.3f}%")


def prep(ws):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import synth_features as sf

    if not os.path.exists(os.path.join(ws, "fp.bin")):
        sf.main(ws, scene="kitti", n_frames=250, seed=3)
    from xrsfm_tpu import enable_compilation_cache
    from xrsfm_tpu.base import snapshot as SNAP
    from xrsfm_tpu.mapper import IncrementalMapper, MapperOptions
    from xrsfm_tpu.pipelines.run_reconstruction import build_map

    enable_compilation_cache()
    m = build_map(ws, os.path.join(ws, "camera.txt"))
    opts = MapperOptions()
    opts.correct_pose = True
    opts.global_polish = False
    opts.rot_avg_polish = False
    t0 = time.time()
    IncrementalMapper(opts).reconstruct(m)
    ate, span, n = _ate(m, ws)
    print(f"prep: {n} reg, ATE {ate:.3f} ({100*ate/span:.2f}% of span), "
          f"{time.time()-t0:.0f}s")
    SNAP.save_snapshot(m, os.path.join(ws, "drifted.npz"))


def exp(ws, rounds, parallax, ta_rounds=6, meas_cache=None,
        rot_freeze=False):
    from xrsfm_tpu import enable_compilation_cache
    from xrsfm_tpu.base import snapshot as SNAP
    from xrsfm_tpu.mapper import ba_glue, triangulate
    from xrsfm_tpu.mapper.incremental import MapperOptions
    from xrsfm_tpu.optim import global_pose, rot_avg
    from xrsfm_tpu.optim.ba import BAOptions

    enable_compilation_cache()
    from xrsfm_tpu.pipelines.run_reconstruction import build_map

    m = build_map(ws, os.path.join(ws, "camera.txt"))
    SNAP.restore_into(m, os.path.join(ws, "drifted.npz"))
    o = MapperOptions()
    ate, span, n = _ate(m, ws)
    print(f"start: {n} reg, ATE {100*ate/span:.3f}%")

    def log(s):
        print("  " + s)

    for r in range(rounds):
        t0 = time.time()
        rotated = global_pose.global_pose_polish(
            m, log=log, parallax=parallax
        )
        ate, span, n = _ate(m, ws)
        print(f"round {r}: polish rewrote={rotated}, ATE {100*ate/span:.3f}% "
              f"({time.time()-t0:.0f}s)")
        if not rotated:
            break
        triangulate.retriangulate(
            m, np.nonzero(m.track_valid[: m.num_tracks])[0], o.tri
        )
        polish = BAOptions(max_iters=2 * o.gba_iters, huber_px=4.0,
                           precise=True)
        reg_frames = list(np.nonzero(m.registered)[0])
        if rot_freeze:
            # settle translations+structure under the AVERAGED rotations
            # first (rotation averaging is the reliable half of the
            # rewrite; a free GBA from rewritten poses can slide back
            # into the drift basin through the rotation directions)
            res = ba_glue.run_ba(m, reg_frames, polish,
                                 freeze_rotations=True)
            print(f"  GBA rot-frozen: {res.initial_cost:.1f} -> "
                  f"{res.final_cost:.1f}")
            ate, span, n = _ate(m, ws)
            print(f"  after rot-frozen settle: ATE {100*ate/span:.3f}%")
        for _g in range(2):
            res = ba_glue.run_ba(m, reg_frames, polish)
            print(f"  GBA: {res.initial_cost:.1f} -> {res.final_cost:.1f}")
        import dataclasses as _dc

        tight = _dc.replace(o.tri, filter_px=o.tri.polish_px)
        triangulate.filter_tracks(m, None, tight)
        triangulate.merge_all_tracks(m, None, o.tri)
        triangulate.retriangulate(m, None, o.tri)
        res = ba_glue.run_ba(m, reg_frames,
                             BAOptions(max_iters=o.gba_iters, huber_px=2.0))
        print(f"  GBA final: {res.initial_cost:.1f} -> {res.final_cost:.1f}")
        ate, span, n = _ate(m, ws)
        print(f"round {r}: after GBA, ATE {100*ate/span:.3f}% "
              f"({time.time()-t0:.0f}s total)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("phase",
                    choices=["prep", "exp", "decompose", "gt_settle",
                             "sweep"])
    ap.add_argument("ws")
    ap.add_argument("--snap", default="drifted.npz",
                    help="snapshot for decompose ('' = the ws model as-is)")
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--parallax", default="off", choices=["off", "lin", "sq"])
    ap.add_argument("--rot_freeze", action="store_true",
                    help="settle translations/structure under the "
                         "averaged rotations before the free GBA rounds")
    args = ap.parse_args()
    if args.phase == "prep":
        prep(args.ws)
    elif args.phase == "decompose":
        decompose(args.ws, args.snap)
    elif args.phase == "gt_settle":
        gt_settle(args.ws, args.snap)
    elif args.phase == "sweep":
        sweep(args.ws, args.snap)
    else:
        exp(args.ws, args.rounds, args.parallax, rot_freeze=args.rot_freeze)


if __name__ == "__main__":
    main()
