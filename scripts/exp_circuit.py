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
    ap.add_argument("phase", choices=["prep", "exp"])
    ap.add_argument("ws")
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--parallax", default="off", choices=["off", "lin", "sq"])
    ap.add_argument("--rot_freeze", action="store_true",
                    help="settle translations/structure under the "
                         "averaged rotations before the free GBA rounds")
    args = ap.parse_args()
    if args.phase == "prep":
        prep(args.ws)
    else:
        exp(args.ws, args.rounds, args.parallax, rot_freeze=args.rot_freeze)


if __name__ == "__main__":
    main()
