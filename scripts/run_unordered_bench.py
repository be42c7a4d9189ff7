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
    shutil.rmtree(args.workdir, ignore_errors=True)
    sf.main(ws, scene="unordered", n_frames=args.n_frames, seed=args.seed,
            per_image_cameras=True, descriptors=True)

    # GT covisibility (for pair precision/recall)
    rng = np.random.default_rng(args.seed)
    centers, R, pts = sf.unordered_scene(rng, args.n_frames)
    focals = rng.uniform(430.0, 570.0, args.n_frames)
    k1s = rng.uniform(-0.08, 0.04, args.n_frames)
    frames_obs = sf.project_all(centers, R, pts, rng, focals=focals, k1s=k1s)
    from collections import defaultdict

    pt2f = defaultdict(set)
    for f, (ids, _) in enumerate(frames_obs):
        for pid in ids:
            pt2f[int(pid)].add(f)
    cnt = defaultdict(int)
    for pid, fs in pt2f.items():
        fs = sorted(fs)
        for i in range(len(fs)):
            for j in range(i + 1, len(fs)):
                cnt[(fs[i], fs[j])] += 1
    n_gt = sum(1 for v in cnt.values() if v >= 30)

    from xrsfm_tpu.pipelines import run_matching as RM

    result = {"frames": args.n_frames, "gt_pairs": n_gt, "matching": {}}
    for mtype in ("retrieval", "covisibility"):
        d = os.path.join(args.workdir, mtype)
        os.makedirs(os.path.join(d, "images"), exist_ok=True)
        shutil.copy(os.path.join(ws, "ftr.bin"), d)
        shutil.copy(os.path.join(ws, "size.bin"), d)
        for i in range(args.n_frames):
            open(os.path.join(d, "images", f"img{i:05d}.png"), "w").close()
        t0 = time.time()
        verified = RM.main(os.path.join(d, "images"), "", mtype, d)
        dt = time.time() - t0
        good = sum(
            1 for p in verified
            if cnt.get((min(p.id1, p.id2), max(p.id1, p.id2)), 0) >= 30
        )
        result["matching"][mtype] = {
            "verified_pairs": len(verified),
            "precision": round(good / max(len(verified), 1), 4),
            "recall": round(good / max(n_gt, 1), 4),
            "wall_s": round(dt, 1),
        }

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
        "ate_pct_span": round(100.0 * ate / span, 3),
        "focal_med_err": round(float(np.median(errs)), 4),
        "focal_mean_err": round(float(errs.mean()), 4),
        "wall_s": round(rec_s, 1),
        "frames_per_s": round(int(reg.sum()) / rec_s, 3),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
