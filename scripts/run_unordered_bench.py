#!/usr/bin/env python
"""1DSfM-regime end-to-end benchmark on the synthetic landmark scene.

Measures the reference's headline comparison (docs/en/benchmark.md:98-114):
matching strategy cost (retrieval vs covisibility expansion) at equal
verified-pair quality, then reconstruction quality through rec_1dsfm
(per-image SIMPLE_RADIAL with EXIF-grade focal noise, intrinsics-refining
BA, multi-focal registration, rotation-averaging polish).

Prints one JSON line:
  {"frames": N, "matching": {retrieval: {...}, covisibility: {...}},
   "reconstruction": {registered, ate_pct, focal_med_err, ...}}

Usage: python scripts/run_unordered_bench.py [--n_frames 80] [--cpu]
       [--workdir /tmp/unordered_bench]
"""

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_frames", type=int, default=80)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--workdir", default="/tmp/unordered_bench")
    ap.add_argument("--cpu", action="store_true")
    # matching-only mode for the expansion-vs-retrieval COST CURVE at
    # reference scale (the reference's published wins are 5-28x at
    # 339-7,725 images, docs/en/benchmark.md:98-114; the win must GROW
    # with frame count as retrieval's candidate set explodes)
    ap.add_argument("--matching_only", action="store_true")
    # unregistrable junk frames — the dominant population of real 1DSfM
    # collections (Alamo: 571 registered of 2,915).  Retrieval top-k is
    # rank-based so junk images still cost 25 verifications each; the
    # expansion's simulated-SfM gate skips them.  0 = the (unrealistic)
    # all-registrable scene.
    ap.add_argument("--distractors", type=int, default=0)
    # resume mode: reuse the workdir's synth scene + verified pairs
    # (stage-cache semantics, like the reference's fp.bin reuse) and run
    # only the reconstruction + evaluation
    ap.add_argument("--rec_only", action="store_true")
    # scene topology: "unordered" = central landmark ring (dense genuine
    # graph, gt pairs ~quadratic); "tour" = street of separate facades
    # (sparse band graph, gt pairs ~linear — real 1DSfM topology; the
    # regime where the reference's 5-28x win lives)
    ap.add_argument("--scene", default="unordered",
                    choices=["unordered", "tour"])
    # which matching strategies to time ("both", "retrieval",
    # "covisibility") — a reconstruction-gate run needs only the
    # covisibility arm
    ap.add_argument("--strategies", default="both")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from xrsfm_tpu import enable_compilation_cache

    enable_compilation_cache()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import synth_features as sf

    ws = os.path.join(args.workdir, "ws")
    if not args.rec_only:
        shutil.rmtree(args.workdir, ignore_errors=True)
        sf.main(ws, scene=args.scene, n_frames=args.n_frames,
                seed=args.seed, per_image_cameras=True, descriptors=True,
                distractors=args.distractors)
    n_total = args.n_frames + args.distractors

    # GT covisibility (for pair precision/recall) — mirrors sf.main's
    # generation order exactly (same seed, same rng consumption)
    n_gt = -1
    if not args.rec_only:
        rng = np.random.default_rng(args.seed)
        centers, R, pts = sf.make_scene(
            args.scene, rng, args.n_frames, n_distractors=args.distractors
        )
        focals = rng.uniform(430.0, 570.0, n_total)
        k1s = rng.uniform(-0.08, 0.04, n_total)
        frames_obs = sf.project_all(centers, R, pts, rng, focals=focals,
                                    k1s=k1s)
        # GT covisibility counts as one visibility-matrix Gram product
        # (per-point python pair loops are O(P * f^2) and explode at 1000
        # frames).  Junk clusters are private to one frame each, so only
        # the genuine-structure columns can co-occur — restricting V to
        # them keeps the matrix at [F, genuine_pts] instead of
        # [F, genuine + 300*distractors] (7 GB at 2,000+ junk frames).
        n_genuine_pts = len(pts) - sf.DISTRACTOR_PTS * args.distractors
        V = np.zeros((n_total, n_genuine_pts), np.float32)
        for f, (ids, _) in enumerate(frames_obs):
            ids = np.asarray(ids, np.int64)
            V[f, ids[ids < n_genuine_pts]] = 1.0
        Cm = V @ V.T  # [F,F] co-observation counts
        np.fill_diagonal(Cm, 0)
        n_gt = int(np.count_nonzero(np.triu(Cm >= 30, k=1)))

    def gt_covis(i, j):
        return Cm[i, j]

    from xrsfm_tpu.pipelines import run_matching as RM

    result = {"frames": args.n_frames, "distractors": args.distractors,
              "gt_pairs": n_gt, "matching": {}}
    if args.rec_only:
        strategies = ()
    elif args.strategies == "both":
        strategies = ("retrieval", "covisibility")
    else:
        strategies = tuple(args.strategies.split(","))
    for mtype in strategies:
        d = os.path.join(args.workdir, mtype)
        os.makedirs(os.path.join(d, "images"), exist_ok=True)
        shutil.copy(os.path.join(ws, "ftr.bin"), d)
        shutil.copy(os.path.join(ws, "size.bin"), d)
        for i in range(n_total):
            open(os.path.join(d, "images", f"img{i:05d}.png"), "w").close()
        t0 = time.time()
        stats = {}
        verified = RM.main(os.path.join(d, "images"), "", mtype, d,
                           stats=stats)
        dt = time.time() - t0
        good = sum(1 for p in verified if gt_covis(p.id1, p.id2) >= 30)
        result["matching"][mtype] = {
            "pairs_proposed": stats.get("pairs_proposed", -1),
            "verified_pairs": len(verified),
            "precision": round(good / max(len(verified), 1), 4),
            "recall": round(good / max(n_gt, 1), 4),
            "wall_s": round(dt, 1),
        }

    if args.matching_only:
        if ("retrieval" in result["matching"]
                and "covisibility" in result["matching"]):
            r = result["matching"]["retrieval"]["wall_s"]
            c = result["matching"]["covisibility"]["wall_s"]
            result["expansion_speedup"] = round(r / max(c, 1e-9), 2)
        print(json.dumps(result), flush=True)
        return

    # reconstruction from the covisibility-matched pairs
    from xrsfm_tpu.ops.umeyama import ate_rmse
    from xrsfm_tpu.pipelines.rec_1dsfm import main as rec_main
    from xrsfm_tpu.utils import geometry as G

    cov = os.path.join(args.workdir, "covisibility")
    t0 = time.time()
    m = rec_main(cov, os.path.join(ws, "camera_info.txt"),
                 os.path.join(cov, "model"))
    rec_s = time.time() - t0
    reg = np.asarray(m.registered)
    gtf = {}
    for line in open(os.path.join(ws, "gt_cameras.txt")):
        p = line.split()
        gtf[p[0]] = float(p[1])
    errs = np.array([
        abs(float(m.cameras[int(m.cam_of_frame[i])][0]) - gtf[m.names[i]])
        / gtf[m.names[i]]
        for i in range(m.num_frames) if reg[i]
    ])
    gtp = {}
    for line in open(os.path.join(ws, "gt_poses.txt")):
        p = line.split()
        gtp[p[0]] = (np.array(list(map(float, p[1:5]))),
                     np.array(list(map(float, p[5:8]))))
    est_c = np.array([
        G.pose_center_np(np.asarray(m.q[i]), np.asarray(m.t[i]))
        for i in range(m.num_frames) if reg[i]
    ])
    gt_c = np.array([
        G.pose_center_np(*gtp[m.names[i]])
        for i in range(m.num_frames) if reg[i]
    ])
    ate = ate_rmse(gt_c, est_c)
    span = float(np.linalg.norm(gt_c.max(0) - gt_c.min(0)))
    result["reconstruction"] = {
        "registered": int(reg.sum()),
        "registerable": args.n_frames,  # genuine frames (junk excluded)
        "ate_pct_span": round(100.0 * ate / span, 3),
        "focal_med_err": round(float(np.median(errs)), 4),
        "focal_mean_err": round(float(errs.mean()), 4),
        "wall_s": round(rec_s, 1),
        "frames_per_s": round(int(reg.sum()) / rec_s, 3),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
